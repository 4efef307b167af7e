"""biahub-tpu: TPU-native bio-image analysis hub.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
czbiohub-sf/biahub (reference: /root/reference). The reference fans one Slurm
job out per OME-Zarr position (reference: biahub/deskew.py:729-752); here the
same work units — (position, time, channel) ZYX volumes — are batched on
device with vmap/shard_map and streamed through tensorstore.
"""

import logging

__version__ = "0.1.0"

_logger = logging.getLogger("biahub_tpu")
if not _logger.handlers:
    _handler = logging.StreamHandler()
    _handler.setFormatter(logging.Formatter("%(levelname)s:%(name)s:%(message)s"))
    _logger.addHandler(_handler)
    _logger.setLevel(logging.INFO)
