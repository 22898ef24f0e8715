"""Scalar helpers shared by sources and operators."""

from .crc16 import crc16_cdma2000, crc16_update  # noqa: F401
