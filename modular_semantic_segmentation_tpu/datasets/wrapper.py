"""Minimal data interface (reference xview/datasets/wrapper.py)."""


class DataWrapper:
    """Interface for providing data in batches."""

    def next(self):
        """Return next batch as dict {modality: array [batch, ...]}."""
        raise NotImplementedError
