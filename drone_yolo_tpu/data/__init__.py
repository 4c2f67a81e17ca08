"""Data pipeline: datasets, augmentation, loaders, builders."""
