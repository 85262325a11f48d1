from .filter_dsl import compile_filter, compile_filters, parse_filter
from .styling import apply_style_rules

__all__ = ["compile_filter", "compile_filters", "parse_filter", "apply_style_rules"]
