from .lowering import build_augmentation
