from . import aggregations, filters, joins, setops, windows

__all__ = ["aggregations", "filters", "joins", "setops", "windows"]
