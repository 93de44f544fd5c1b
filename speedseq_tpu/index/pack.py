"""2-bit packed reference (.pac) codec, BWA-compatible.

File contract (proven against reference example/data/*.fasta.pac, 80,410 B
for a 321,635 bp genome): 4 bases/byte with the first base in bits 7-6;
if len%4==0 an extra zero byte is appended; the final byte holds len%4.
"""

from __future__ import annotations

import numpy as np

_SHIFTS = np.array([6, 4, 2, 0], dtype=np.uint8)


def pack_pac(bases: np.ndarray) -> bytes:
    """Pack base codes (0-3; callers must resolve N first) into .pac bytes
    (without the trailing length byte)."""
    n = len(bases)
    padded = np.zeros(((n + 3) // 4) * 4, dtype=np.uint8)
    padded[:n] = bases & 3
    quads = padded.reshape(-1, 4)
    packed = (
        (quads[:, 0] << 6) | (quads[:, 1] << 4) | (quads[:, 2] << 2) | quads[:, 3]
    ).astype(np.uint8)
    return packed.tobytes()


def unpack_pac(data: bytes, n: int) -> np.ndarray:
    """Unpack n bases from .pac payload bytes."""
    raw = np.frombuffer(data, dtype=np.uint8)
    out = np.empty((len(raw), 4), dtype=np.uint8)
    out[:, 0] = (raw >> 6) & 3
    out[:, 1] = (raw >> 4) & 3
    out[:, 2] = (raw >> 2) & 3
    out[:, 3] = raw & 3
    return out.reshape(-1)[:n]


def write_pac(path: str, bases: np.ndarray) -> None:
    """Write a BWA-format .pac file (bwa bns_dump/pac write semantics)."""
    n = len(bases)
    with open(path, "wb") as fh:
        fh.write(pack_pac(bases))
        if n % 4 == 0:
            fh.write(b"\x00")
        fh.write(bytes([n % 4]))


def read_pac(path: str) -> np.ndarray:
    """Read a BWA-format .pac file back into base codes."""
    with open(path, "rb") as fh:
        data = fh.read()
    rem = data[-1]
    payload = data[:-1]
    if rem == 0:
        payload = payload[:-1]
        n = len(payload) * 4
    else:
        n = (len(payload) - 1) * 4 + rem
    return unpack_pac(payload, n)
