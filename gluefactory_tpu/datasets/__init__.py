from .base_dataset import BaseDataset, collate, get_dataset  # noqa: F401
