"""API-parity module: ``nksr_tpu.configs.load_checkpoint_from_url``
(reference: ``nksr.configs``, /root/reference/models/nksr_net.py:17)."""

from .utils.checkpoint import load_checkpoint_from_url, PRETRAINED

__all__ = ["load_checkpoint_from_url", "PRETRAINED"]
