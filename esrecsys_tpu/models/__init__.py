"""Model zoo: Glove, playlist next-track, Shop-the-Look CNN towers, txt2url."""

from esrecsys_tpu.models.layers import TableEmbed
from esrecsys_tpu.models.glove import Glove

__all__ = ["TableEmbed", "Glove"]
