"""Interop with the reference implementation's artifacts.

The reference ships pretrained ``tf.train.Checkpoint`` files (reference
README.md:4, restored model-only at inference.py:121-123). This package reads
and writes that on-disk format — TensorFlow's *TensorBundle* (an SSTable
``.index`` plus raw ``.data-*`` shards) — in pure Python/NumPy, with no
TensorFlow dependency, and maps the reference's object-graph variable names
onto this framework's Flax parameter tree.
"""

from .tensorbundle import BundleReader, BundleWriter  # noqa: F401
from .importer import (load_reference_checkpoint,  # noqa: F401
                       export_reference_checkpoint)
from .weight_map import build_weight_map  # noqa: F401
