from .sc09 import Collator, DataLoader, SC09DataModule, SC09Dataset, load_wav, save_wav

__all__ = [
    "Collator",
    "DataLoader",
    "SC09DataModule",
    "SC09Dataset",
    "load_wav",
    "save_wav",
]
