"""Framework version.

Parity anchor: reference src/marqo/version.py:1 (``__version__ = "2.13.0"``).
We track the reference's feature level (2.13) with our own build number.
"""

__version__ = "2.13.0+tpu.0.1.0"
__marqo_feature_level__ = "2.13.0"


def get_version() -> str:
    return __version__
