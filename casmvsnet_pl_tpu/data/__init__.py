from .blendedmvs import BlendedMVSDataset
from .dtu import DTUDataset
from .loader import DataLoader, collate, prefetch_to_device
from .pfm import read_pfm, save_pfm
from .tanks import TanksDataset

dataset_dict = {
    "dtu": DTUDataset,
    "tanks": TanksDataset,
    "blendedmvs": BlendedMVSDataset,
}

__all__ = ["DTUDataset", "BlendedMVSDataset", "TanksDataset", "dataset_dict",
           "DataLoader", "collate", "prefetch_to_device",
           "read_pfm", "save_pfm"]
