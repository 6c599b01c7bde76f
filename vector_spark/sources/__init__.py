from .tables import load_table, load_tables, register_views
from .pages import generate_pages, geo_dim, lang_dim, domain_dim

__all__ = [
    "load_table",
    "load_tables",
    "register_views",
    "generate_pages",
    "geo_dim",
    "lang_dim",
    "domain_dim",
]
