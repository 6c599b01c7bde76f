from .pages import parse_pages, pages_pipeline, PAGE_ROUTES

__all__ = ["parse_pages", "pages_pipeline", "PAGE_ROUTES"]
