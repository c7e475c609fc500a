"""Data layer: chunked stores, DANRA datasets, geo preprocessing, prefetch."""

from .dataset import BatchLoader, DanraDataset, DanraDatasetConfig, collate
from .mnist import has_real_mnist, load_mnist
from .splits import split_files
from .imagen_data import ImageFolderDataset, ImagenCollator, ImagenLoader
from .geo import (
    DateFromFile,
    Scale,
    find_rand_points,
    generate_sdf,
    normalize_sdf,
    preprocess_lsm_topography,
    preprocess_lsm_topography_from_data,
)
from .evalset import build_matched_eval_set, match_dates, season_counts
from .pipeline import prefetch_to_device
from .store import (
    DirectoryStore,
    convert_nc_to_store,
    convert_npz_to_store,
    open_group,
    write_member,
)
from .synthetic import (
    gaussian_random_field,
    make_synthetic_store,
    synthetic_geography,
    synthetic_temperature,
)

__all__ = [
    "BatchLoader",
    "build_matched_eval_set",
    "match_dates",
    "season_counts",
    "ImageFolderDataset",
    "ImagenCollator",
    "ImagenLoader",
    "DanraDataset",
    "DanraDatasetConfig",
    "DateFromFile",
    "DirectoryStore",
    "Scale",
    "collate",
    "convert_nc_to_store",
    "convert_npz_to_store",
    "find_rand_points",
    "gaussian_random_field",
    "generate_sdf",
    "has_real_mnist",
    "load_mnist",
    "split_files",
    "make_synthetic_store",
    "normalize_sdf",
    "open_group",
    "prefetch_to_device",
    "preprocess_lsm_topography",
    "preprocess_lsm_topography_from_data",
    "synthetic_geography",
    "synthetic_temperature",
    "write_member",
]
