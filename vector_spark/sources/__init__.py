from .tables import load_table, load_tables, register_views
from .pages import generate_pages, geo_dim, geoip_dim, geoip_ranges, lang_dim, domain_dim
from .demo_logs import demo_logs, FORMATS as DEMO_LOG_FORMATS

__all__ = [
    "load_table",
    "load_tables",
    "register_views",
    "generate_pages",
    "geo_dim",
    "geoip_dim",
    "geoip_ranges",
    "lang_dim",
    "domain_dim",
    "demo_logs",
    "DEMO_LOG_FORMATS",
]
