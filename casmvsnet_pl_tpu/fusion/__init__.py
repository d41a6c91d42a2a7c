from .consistency import (check_geo_consistency, check_geo_consistency_np)
from .fuse import backproject, fuse_and_write, fuse_scan, upsample_proba
from .ply import read_ply, write_ply
from .spill import SpillCache

__all__ = ["check_geo_consistency", "check_geo_consistency_np",
           "fuse_scan", "fuse_and_write", "backproject", "upsample_proba",
           "write_ply", "read_ply", "SpillCache"]
