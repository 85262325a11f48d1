from . import datetimes, geo, strings

__all__ = ["datetimes", "geo", "strings"]
