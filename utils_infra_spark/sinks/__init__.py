from .mbtiles import write_mbtiles

__all__ = ["write_mbtiles"]
