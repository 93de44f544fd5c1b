"""SAM record model + text codec (htslib sam.c-equivalent).

Contracts reproduced from the reference's vendored htslib:
- flag bits: src/samtools-1.3.1/htslib-1.3.1/htslib/sam.h:106-130
- CIGAR op encoding ``len<<4|op`` with op order MIDNSHP=X B:
  src/.../htslib/sam.h:82-104
- SAM text formatting: src/.../sam.c:1072 (sam_format1)
- header parsing: src/.../sam.c:740-782
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

# --- flags (htslib/sam.h:106-130) -----------------------------------------
FPAIRED = 0x1
FPROPER_PAIR = 0x2
FUNMAP = 0x4
FMUNMAP = 0x8
FREVERSE = 0x10
FMREVERSE = 0x20
FREAD1 = 0x40
FREAD2 = 0x80
FSECONDARY = 0x100
FQCFAIL = 0x200
FDUP = 0x400
FSUPPLEMENTARY = 0x800

# --- CIGAR (htslib/sam.h:82-104) ------------------------------------------
CIGAR_OPS = "MIDNSHP=XB"
CIGAR_M, CIGAR_I, CIGAR_D, CIGAR_N, CIGAR_S, CIGAR_H, CIGAR_P, CIGAR_EQ, CIGAR_X, CIGAR_B = range(10)
# ops that consume query / reference (bam_cigar_type table)
_CONSUME_QUERY = {CIGAR_M, CIGAR_I, CIGAR_S, CIGAR_EQ, CIGAR_X}
_CONSUME_REF = {CIGAR_M, CIGAR_D, CIGAR_N, CIGAR_EQ, CIGAR_X}

_CIGAR_RE = re.compile(rb"(\d+)([MIDNSHP=XB])")


def cigar_to_str(cigar: List[Tuple[int, int]]) -> str:
    if not cigar:
        return "*"
    return "".join(f"{ln}{CIGAR_OPS[op]}" for op, ln in cigar)


def cigar_from_str(s: str) -> List[Tuple[int, int]]:
    if s == "*" or not s:
        return []
    out = []
    for m in _CIGAR_RE.finditer(s.encode()):
        out.append((CIGAR_OPS.index(chr(m.group(2)[0])), int(m.group(1))))
    return out


def cigar_query_len(cigar: List[Tuple[int, int]]) -> int:
    return sum(ln for op, ln in cigar if op in _CONSUME_QUERY)


def cigar_ref_len(cigar: List[Tuple[int, int]]) -> int:
    return sum(ln for op, ln in cigar if op in _CONSUME_REF)


@dataclass
class SAMHeader:
    """Parsed @HD/@SQ/@RG/@PG/@CO header."""

    text: str = ""
    refs: List[Tuple[str, int]] = field(default_factory=list)  # (name, len)

    def __post_init__(self):
        if self.text and not self.refs:
            for line in self.text.splitlines():
                if line.startswith("@SQ"):
                    d = dict(
                        f.split(":", 1) for f in line.split("\t")[1:] if ":" in f
                    )
                    self.refs.append((d["SN"], int(d["LN"])))

    @property
    def ref_names(self) -> List[str]:
        return [n for n, _ in self.refs]

    @property
    def ref_lens(self) -> List[int]:
        return [l for _, l in self.refs]

    def tid(self, name: str) -> int:
        try:
            return self.ref_names.index(name)
        except ValueError:
            return -1

    @classmethod
    def build(
        cls,
        refs: List[Tuple[str, int]],
        read_groups: Optional[List[str]] = None,
        sort_order: str = "coordinate",
        programs: Optional[List[str]] = None,
        extra_lines: Optional[List[str]] = None,
    ) -> "SAMHeader":
        lines = [f"@HD\tVN:1.3\tSO:{sort_order}"]
        lines += [f"@SQ\tSN:{n}\tLN:{l}" for n, l in refs]
        for rg in read_groups or []:
            lines.append(rg if rg.startswith("@RG") else f"@RG\t{rg}")
        lines += programs or []
        lines += extra_lines or []
        return cls(text="\n".join(lines) + "\n", refs=list(refs))


_AUX_FMT = {  # SAM text representation per aux type
    "A": "A", "i": "i", "f": "f", "Z": "Z", "H": "H", "B": "B",
    "c": "i", "C": "i", "s": "i", "S": "i", "I": "i",
}


@dataclass
class SAMRecord:
    """One alignment record (bam1_t equivalent; htslib/sam.h:148-181)."""

    qname: str
    flag: int
    tid: int            # -1 = unmapped (*)
    pos: int            # 0-based leftmost
    mapq: int
    cigar: List[Tuple[int, int]]  # [(op, len)]
    mtid: int
    mpos: int
    tlen: int
    seq: str            # "*" allowed (splitter/discordant stripping)
    qual: str           # "*" allowed
    tags: List[Tuple[str, str, object]] = field(default_factory=list)
    # tags: (tag, type_char, value); value for 'B' = (subtype, list)

    def is_unmapped(self) -> bool:
        return bool(self.flag & FUNMAP)

    def is_reverse(self) -> bool:
        return bool(self.flag & FREVERSE)

    def end_pos(self) -> int:
        """rightmost ref coordinate, exclusive (bam_endpos)."""
        rl = cigar_ref_len(self.cigar)
        return self.pos + (rl if rl > 0 else 1)

    def get_tag(self, tag: str):
        for t, ty, v in self.tags:
            if t == tag:
                return v
        return None

    def set_tag(self, tag: str, type_char: str, value) -> None:
        self.tags = [(t, ty, v) for t, ty, v in self.tags if t != tag]
        self.tags.append((tag, type_char, value))

    def to_sam(self, header: SAMHeader) -> str:
        rname = header.ref_names[self.tid] if self.tid >= 0 else "*"
        rnext = (
            "="
            if self.mtid == self.tid and self.mtid >= 0
            else (header.ref_names[self.mtid] if self.mtid >= 0 else "*")
        )
        fields = [
            self.qname,
            str(self.flag),
            rname,
            str(self.pos + 1),
            str(self.mapq),
            cigar_to_str(self.cigar),
            rnext,
            str(self.mpos + 1),
            str(self.tlen),
            self.seq or "*",
            self.qual or "*",
        ]
        for tag, ty, v in self.tags:
            if ty == "B":
                sub, arr = v
                fields.append(f"{tag}:B:{sub},{','.join(str(x) for x in arr)}")
            elif ty == "f":
                fields.append(f"{tag}:f:{fmt_float(v)}")
            else:
                fields.append(f"{tag}:{_AUX_FMT.get(ty, ty)}:{v}")
        return "\t".join(fields)

    @classmethod
    def from_sam(cls, line: str, header: SAMHeader) -> "SAMRecord":
        f = line.rstrip("\n").split("\t")
        tid = header.tid(f[2]) if f[2] != "*" else -1
        mtid = tid if f[6] == "=" else (header.tid(f[6]) if f[6] != "*" else -1)
        tags = []
        for t in f[11:]:
            tag, ty, val = t.split(":", 2)
            if ty == "i":
                tags.append((tag, "i", int(val)))
            elif ty == "f":
                tags.append((tag, "f", float(val)))
            elif ty == "B":
                sub = val[0]
                nums = val[2:].split(",") if len(val) > 2 else []
                conv = float if sub in "f" else int
                tags.append((tag, "B", (sub, [conv(x) for x in nums])))
            else:
                tags.append((tag, ty, val))
        return cls(
            qname=f[0],
            flag=int(f[1]),
            tid=tid,
            pos=int(f[3]) - 1,
            mapq=int(f[4]),
            cigar=cigar_from_str(f[5]),
            mtid=mtid,
            mpos=int(f[7]) - 1,
            tlen=int(f[8]),
            seq=f[9],
            qual=f[10],
            tags=tags,
        )


def fmt_float(v: float) -> str:
    """htslib %g float formatting for aux/VCF fields."""
    return f"{v:g}"


def read_sam(path: str) -> Tuple[SAMHeader, List[SAMRecord]]:
    header_lines: List[str] = []
    records: List[SAMRecord] = []
    with open(path) as fh:
        header = None
        for line in fh:
            if line.startswith("@"):
                header_lines.append(line.rstrip("\n"))
            else:
                if header is None:
                    header = SAMHeader(text="\n".join(header_lines) + "\n")
                records.append(SAMRecord.from_sam(line, header))
        if header is None:
            header = SAMHeader(text="\n".join(header_lines) + ("\n" if header_lines else ""))
    return header, records


def write_sam(path: str, header: SAMHeader, records: List[SAMRecord]) -> None:
    with open(path, "w") as fh:
        if header.text:
            fh.write(header.text)
        for r in records:
            fh.write(r.to_sam(header) + "\n")
