"""CRC-16/CDMA2000 — the checksum used by the `.ss` file format.

Parameters are from the public CRC catalog (width=16, poly=0xC867,
init=0xFFFF, refin=false, refout=false, xorout=0x0000); the reference uses the
same published algorithm (sea-streamer-file/src/crc.rs:1-10 cites pycrc with
this config). The table is derived from the polynomial at import time, and the
implementation is validated against the standard check value
``crc16("123456789") == 0x4C06`` in tests.
"""

from __future__ import annotations

_POLY = 0xC867
_INIT = 0xFFFF


def _make_table(poly: int) -> list[int]:
    table = []
    for byte in range(256):
        crc = byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ poly) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
        table.append(crc)
    return table


_TABLE = _make_table(_POLY)


def crc16_update(crc: int, data: bytes) -> int:
    for d in data:
        crc = (_TABLE[((crc >> 8) ^ d) & 0xFF] ^ (crc << 8)) & 0xFFFF
    return crc


def crc16_cdma2000(data: bytes) -> int:
    return crc16_update(_INIT, data)


class RunningChecksum:
    """Running per-stream checksum over message checksums.

    Mirrors the beacon ``running_checksum`` semantics
    (sea-streamer-file/src/format.rs:470-504): each message's 2-byte CRC is
    folded big-endian into a CRC initialized to 0xFFFF.
    """

    def __init__(self, crc: int = _INIT) -> None:
        self.crc = crc

    def update(self, checksum: int) -> None:
        self.crc = crc16_update(self.crc, checksum.to_bytes(2, "big"))

    @classmethod
    def resume(cls, crc: int) -> "RunningChecksum":
        return cls(crc)
