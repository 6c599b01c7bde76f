from .pages import parse_pages, pages_pipeline, PAGE_ROUTES
from .crawl import crawl_pipeline, CRAWL_ROUTES

__all__ = [
    "parse_pages", "pages_pipeline", "PAGE_ROUTES",
    "crawl_pipeline", "CRAWL_ROUTES",
]
