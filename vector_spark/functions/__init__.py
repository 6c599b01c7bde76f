from .vrl import (
    parse_json_field,
    parse_regex,
    parse_key_value,
    parse_url_parts,
    render_template,
)

__all__ = [
    "parse_json_field",
    "parse_regex",
    "parse_key_value",
    "parse_url_parts",
    "render_template",
]
