"""Illumina BCL/CBCL raw base-call input.

Reference: input-blc.c — layout discovery `iBLC_guess_format_string`
(:227) + `iBLC_inner_scan_dir` (:44), chunked cluster cache
`cacheBCL_init`/`iCache_continuous_read_lanes` (:379/:430), sample sheet
`input_BLC_parse_SampleSheet` (:940), cell-barcode list
`input_BLC_parse_CellBarcodes` (:1030).

Formats (as handled by the reference, byte-for-byte):

* RunInfo.xml — read segments `<Read NumCycles=".." IsIndexedRead="Y|N">`
  and (CBCL) the `<Tiles>` list, each `lane_ssst` (surface/swath/tile).
* plain BCL (NextSeq-style): `<base>/L%03d/%04d.bcl[.gz|.bgzf]`, one file
  per cycle per lane; 4-byte cluster-count header then one byte per
  cluster: 0 = no-call, else base = "ACGT"[b & 3], phred = b >> 2
  (input-blc.c:711-712).
* filter: `<base>/L%03d/s_<lane>.filter` (or per-tile
  `s_<lane>_<tile>.filter`); 12-byte header then one pass-filter byte per
  cluster (input-blc.c:334,448).
* CBCL (NovaSeq-style): `<base>/L%03d/C<cycle>.1/L%03d_<surface>.cbcl`:
  header = u16 version, u32 header_size, u8 bits_per_call (=2),
  u8 bits_per_qscore (2 or 6), u32 n_bins, n_bins×(u32 from, u32 to)
  qscore map, u32 n_tiles, n_tiles×(u32 tile, u32 n_clusters,
  u32 uncompressed_size, u32 compressed_size), u8 excludeNonPF, then one
  gzip stream per tile back-to-back (input-blc.c:476-533).  2-bit mode
  packs two clusters per byte, low nibble first; cluster value =
  (call & 3) | (mapped_qscore << 2) (input-blc.c:548-562).

The reference streams clusters one byte at a time through pthread-filled
chunk caches; here each (lane, tile) block is decoded as one numpy
vector op and the PF filter is applied as a boolean mask.
"""

from __future__ import annotations

import gzip
import io
import os
import re
import struct
import zlib
from dataclasses import dataclass, field

import numpy as np

LANE_ALL = -1  # sample sheet "*" lane


# --------------------------------------------------------------------------
# RunInfo.xml


@dataclass
class ReadSegment:
    cycles: int
    is_index: bool


@dataclass
class RunInfo:
    segments: list[ReadSegment]
    tiles: list[int]  # 7-digit lane*1000000 + ssst (may be empty)

    @property
    def total_cycles(self) -> int:
        return sum(s.cycles for s in self.segments)


def parse_run_info(path: str) -> RunInfo:
    text = open(path).read()
    segs = []
    for m in re.finditer(r"<Read\b[^>]*>", text):
        tag = m.group(0)
        nc = re.search(r'NumCycles="(\d+)"', tag)
        ii = re.search(r'IsIndexedRead="([YNyn])"', tag)
        if nc:
            segs.append(
                ReadSegment(int(nc.group(1)), bool(ii and ii.group(1) in "Yy"))
            )
    tiles = []
    tm = re.search(r"<Tiles>(.*?)</Tiles>", text, re.S)
    if tm:
        for t in re.finditer(r"<Tile>([0-9_]+)</Tile>", tm.group(1)):
            lane_s, tile_s = t.group(1).split("_")
            tiles.append(int(lane_s) * 1000000 + int(tile_s))
    return RunInfo(segments=segs, tiles=tiles)


# --------------------------------------------------------------------------
# Sample sheets (input_BLC_parse_SampleSheet, input-blc.c:940-1026)

SHEET_RAWDIR = "rawdir"
SHEET_BAM = "bam"
SHEET_FASTQ = "fastq"


@dataclass
class SampleEntry:
    sample: str
    lane: int          # LANE_ALL for "*"
    index: str | None  # sample index barcode (rawdir format)
    line_no: int       # 1-based data line (the reference's sample id)
    files: tuple = ()  # fastq pair / bam path for the other formats


def parse_sample_sheet(path: str) -> tuple[str, list[SampleEntry]]:
    """Returns (format, entries); format one of rawdir/bam/fastq.

    The reference recognises the `[Data]` section; the first data line is
    a header whose columns decide the format: `Lane,...` = raw BCL dirs,
    `BAMFile,...` = per-sample BAMs, `BarcodeUMIFile,...` = FASTQ pairs.
    """
    entries: list[SampleEntry] = []
    fmt = None
    in_data = False
    header_seen = False
    line_no = 0
    for raw in open(path):
        line = raw.strip()
        if not line or len(line) < 5:
            continue
        if line.startswith("["):
            in_data = "ata]" in line  # [Data] (reference matches "ata]")
            header_seen = False
            continue
        if not in_data:
            continue
        if not header_seen:
            header_seen = True
            if "Lane" in line:
                fmt = SHEET_RAWDIR
                continue
            if "BAMFile" in line:
                fmt = SHEET_BAM
                continue
            if "BarcodeUMIFile" in line:
                fmt = SHEET_FASTQ
                continue
            # no recognised header: fall through and treat as data (rawdir)
            fmt = SHEET_RAWDIR
        cols = [c.strip() for c in line.split(",")]
        line_no += 1
        if fmt == SHEET_RAWDIR:
            if len(cols) < 4:
                continue
            lane = LANE_ALL if "*" in cols[0] else int(cols[0])
            entries.append(
                SampleEntry(
                    sample=cols[2], lane=lane, index=cols[3], line_no=line_no
                )
            )
        elif fmt == SHEET_FASTQ:
            entries.append(
                SampleEntry(
                    sample=cols[2], lane=LANE_ALL, index=None,
                    line_no=line_no, files=(cols[0], cols[1]),
                )
            )
        else:  # bam
            entries.append(
                SampleEntry(
                    sample=cols[1], lane=LANE_ALL, index=None,
                    line_no=line_no, files=(cols[0],),
                )
            )
    if fmt is None:
        raise ValueError(f"{path}: no [Data] section found")
    return fmt, entries


def parse_cell_barcodes(path: str) -> list[str]:
    """Cell-barcode whitelist, optionally gzipped; -N suffixes stripped
    (input_BLC_parse_CellBarcodes, input-blc.c:1030)."""
    op = gzip.open if path.endswith(".gz") else open
    out = []
    with op(path, "rt") as f:
        for line in f:
            bc = line.strip().split("-")[0]
            if bc:
                out.append(bc)
    return out


# --------------------------------------------------------------------------
# Layout discovery


@dataclass
class BclLayout:
    base: str              # BaseCalls dir containing L00x
    mode: str              # "bcl" | "cbcl"
    lanes: list[int]
    run_info: RunInfo
    per_tile_filter: bool
    surfaces: list[int] = field(default_factory=list)  # cbcl L%03d_<s>.cbcl


def _find_run_info(data_dir: str) -> str | None:
    d = os.path.abspath(data_dir)
    for _ in range(6):  # walk up towards the run folder
        cand = os.path.join(d, "RunInfo.xml")
        if os.path.exists(cand):
            return cand
        nd = os.path.dirname(d)
        if nd == d:
            break
        d = nd
    for root, _dirs, files in os.walk(data_dir):
        if "RunInfo.xml" in files:
            return os.path.join(root, "RunInfo.xml")
    return None


def _find_basecalls(data_dir: str) -> str | None:
    if re.search(r"L\d\d\d$", data_dir):
        return os.path.dirname(data_dir)
    for root, dirs, _files in os.walk(data_dir):
        if any(re.fullmatch(r"L\d\d\d", d) for d in dirs):
            return root
    return None


def discover_layout(data_dir: str) -> BclLayout:
    ri_path = _find_run_info(data_dir)
    if ri_path is None:
        raise FileNotFoundError(f"RunInfo.xml not found around {data_dir}")
    run_info = parse_run_info(ri_path)
    base = _find_basecalls(data_dir)
    if base is None:
        raise FileNotFoundError(f"no L00x lane dirs under {data_dir}")
    lanes = sorted(
        int(d[1:]) for d in os.listdir(base) if re.fullmatch(r"L\d\d\d", d)
    )
    l1 = os.path.join(base, f"L{lanes[0]:03d}")
    cdirs = [d for d in os.listdir(l1) if re.fullmatch(r"C\d+\.1", d)]
    if cdirs:
        cbcls = [f for f in os.listdir(os.path.join(l1, cdirs[0]))
                 if f.endswith(".cbcl")]
        if not cbcls:
            raise FileNotFoundError(f"no .cbcl files in {l1}/{cdirs[0]}")
        surfaces = sorted(
            int(re.search(r"_(\d+)\.cbcl$", f).group(1)) for f in cbcls
        )
        return BclLayout(base, "cbcl", lanes, run_info, True, surfaces)
    per_tile = any(
        re.fullmatch(r"s_\d+_\d+\.filter", f) for f in os.listdir(l1)
    )
    return BclLayout(base, "bcl", lanes, run_info, per_tile)


# --------------------------------------------------------------------------
# Decoders


def _auto_read(path_noext: str) -> bytes:
    """Read `path` with transparent .gz/.bgzf handling (reference autozip)."""
    for ext in ("", ".gz", ".bgzf"):
        p = path_noext + ext
        if os.path.exists(p):
            data = open(p, "rb").read()
            if ext or data[:2] == b"\x1f\x8b":
                return gzip.decompress(data)
            return data
    raise FileNotFoundError(path_noext)


def decode_bcl_values(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Cluster-value bytes → (seq ascii uint8, qual ascii uint8).
    0 = 'N'/'#'; else "ACGT"[v&3] with phred33 v>>2 (input-blc.c:708-712)."""
    base_lut = np.frombuffer(b"ACGT", np.uint8)
    seq = np.where(vals == 0, np.uint8(ord("N")), base_lut[vals & 3])
    qual = np.where(vals == 0, np.uint8(ord("#")), (vals >> 2) + np.uint8(33))
    return seq, qual


def _read_filter(layout: BclLayout, lane: int) -> np.ndarray:
    """PF bytes for one lane (concatenated over tiles when per-tile)."""
    ldir = os.path.join(layout.base, f"L{lane:03d}")
    if layout.per_tile_filter:
        parts = []
        for t7 in layout.run_info.tiles:
            if t7 // 1000000 != lane:
                continue
            raw = _auto_read(os.path.join(ldir, f"s_{lane}_{t7 % 10000:04d}.filter"))
            parts.append(np.frombuffer(raw, np.uint8)[12:])
        if parts:
            return np.concatenate(parts) != 0
    raw = _auto_read(os.path.join(ldir, f"s_{lane}.filter"))
    return np.frombuffer(raw, np.uint8)[12:] != 0


class _CbclCycle:
    """One parsed CBCL file: per-tile decode on demand."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            hdr = f.read(10)
            (self.version, self.header_size, bits_call, self.bits_q) = (
                struct.unpack("<HIBB", hdr[:8])
            )
            f.seek(6)
            bits_call, self.bits_q = struct.unpack("<BB", f.read(2))
            assert bits_call == 2, f"unsupported bits-per-call {bits_call}"
            assert self.bits_q in (2, 6), f"unsupported bits-per-qscore {self.bits_q}"
            (n_bins,) = struct.unpack("<I", f.read(4))
            self.qmap = np.zeros(max(n_bins, 1), np.uint8)
            for i in range(n_bins):
                frm, to = struct.unpack("<II", f.read(8))
                assert frm == i
                self.qmap[i] = to
            (n_tiles,) = struct.unpack("<I", f.read(4))
            self.tiles: dict[int, tuple[int, int, int, int]] = {}
            off = f.tell() + 16 * n_tiles + 1
            order = []
            for _ in range(n_tiles):
                tile, n_clusters, usize, csize = struct.unpack("<IIII", f.read(16))
                self.tiles[tile] = (off, csize, n_clusters, usize)
                order.append(tile)
                off += csize
            (self.exclude_non_pf,) = struct.unpack("<B", f.read(1))
            self.tile_order = order

    def tile_values(self, tile4: int) -> np.ndarray:
        off, csize, n_clusters, _usize = self.tiles[tile4]
        with open(self.path, "rb") as f:
            f.seek(off)
            comp = f.read(csize)
        raw = np.frombuffer(gzip.decompress(comp), np.uint8)
        if self.bits_q == 6:
            vals = raw[:n_clusters]
        else:
            nibbles = np.empty(len(raw) * 2, np.uint8)
            nibbles[0::2] = raw & 0xF       # low nibble = first cluster
            nibbles[1::2] = raw >> 4
            nib = nibbles[:n_clusters]
            vals = (nib & 3) | (self.qmap[nib >> 2] << 2)
        return vals


@dataclass
class LaneReads:
    """All pass-filter clusters of one lane, split into read segments."""

    lane: int
    segments: list[tuple[np.ndarray, np.ndarray]]  # (seq, qual) [n_pf, cycles]
    n_clusters: int
    n_pf: int


class BclReader:
    """Vectorised whole-lane reader for both plain-BCL and CBCL layouts."""

    def __init__(self, data_dir: str):
        self.layout = discover_layout(data_dir)

    @property
    def segments(self) -> list[ReadSegment]:
        return self.layout.run_info.segments

    def read_lane(self, lane: int) -> LaneReads:
        layout = self.layout
        pf = _read_filter(layout, lane)
        total = layout.run_info.total_cycles
        if layout.mode == "bcl":
            cols = []
            ldir = os.path.join(layout.base, f"L{lane:03d}")
            for cyc in range(1, total + 1):
                raw = _auto_read(os.path.join(ldir, f"{cyc:04d}.bcl"))
                vals = np.frombuffer(raw, np.uint8)[4:]  # 4-byte count header
                cols.append(vals[: len(pf)][pf])
            mat = np.stack(cols, axis=1)  # [n_pf, cycles]
        else:
            tiles = [t for t in layout.run_info.tiles if t // 1000000 == lane]
            cols = []
            for cyc in range(1, total + 1):
                percycle = []
                for surface in layout.surfaces:
                    p = os.path.join(
                        layout.base, f"L{lane:03d}", f"C{cyc}.1",
                        f"L{lane:03d}_{surface}.cbcl",
                    )
                    if os.path.exists(p):
                        percycle.append(_CbclCycle(p))
                # clusters in tile order; surface chosen by tile membership
                parts = []
                pf_off = 0
                for t7 in tiles:
                    t4 = t7 % 10000
                    cy = next(c for c in percycle if t4 in c.tiles)
                    vals = cy.tile_values(t4)
                    n_all = (
                        len(vals) if not cy.exclude_non_pf
                        else int(pf[pf_off : pf_off + cy.tiles[t4][2]].size)
                    )
                    if cy.exclude_non_pf:
                        # data already PF-only; advance pf by the tile's
                        # cluster count from the filter file
                        n_tile_all = _tile_cluster_count(layout, lane, t4)
                        parts.append(vals)
                        pf_off += n_tile_all
                    else:
                        n_tile_all = len(vals)
                        parts.append(vals[pf[pf_off : pf_off + n_tile_all]])
                        pf_off += n_tile_all
                cols.append(np.concatenate(parts))
            mat = np.stack(cols, axis=1)
        # split cycles into read segments and decode
        segs = []
        c0 = 0
        for seg in layout.run_info.segments:
            sub = mat[:, c0 : c0 + seg.cycles]
            segs.append(decode_bcl_values(sub))
            c0 += seg.cycles
        return LaneReads(
            lane=lane, segments=segs, n_clusters=len(pf), n_pf=int(mat.shape[0])
        )

    def read_all(self) -> list[LaneReads]:
        return [self.read_lane(lane) for lane in self.layout.lanes]


def _tile_cluster_count(layout: BclLayout, lane: int, tile4: int) -> int:
    raw = _auto_read(
        os.path.join(layout.base, f"L{lane:03d}", f"s_{lane}_{tile4:04d}.filter")
    )
    return len(raw) - 12


# --------------------------------------------------------------------------
# Synthetic run writer (test fixture / demo; the reference ships no BCL
# test data so correctness is validated by round-trip)


def write_synthetic_run(
    out_dir: str,
    reads_per_lane: dict[int, list[tuple[str, ...]]],
    segments: list[ReadSegment],
    mode: str = "bcl",
    pass_filter: dict[int, np.ndarray] | None = None,
    tiles_per_lane: int = 1,
) -> None:
    """Write a minimal Illumina run dir.  reads_per_lane maps lane →
    list of per-read segment strings (each read = tuple of segment seqs);
    quality is fixed at phred 30 ('?')."""
    os.makedirs(out_dir, exist_ok=True)
    total = sum(s.cycles for s in segments)
    tiles_xml = ""
    lanes = sorted(reads_per_lane)
    tile4s = [1101 + i for i in range(tiles_per_lane)]
    if mode == "cbcl":
        tiles_xml = "<Tiles>" + "".join(
            f"<Tile>{lane}_{t4}</Tile>" for lane in lanes for t4 in tile4s
        ) + "</Tiles>"
    reads_xml = "".join(
        f'<Read Number="{i+1}" NumCycles="{s.cycles}" '
        f'IsIndexedRead="{"Y" if s.is_index else "N"}"/>'
        for i, s in enumerate(segments)
    )
    with open(os.path.join(out_dir, "RunInfo.xml"), "w") as f:
        f.write(
            "<?xml version=\"1.0\"?><RunInfo><Run>"
            f"<Reads>{reads_xml}</Reads>"
            f"<FlowcellLayout>{tiles_xml}</FlowcellLayout>"
            "</Run></RunInfo>"
        )
    base = os.path.join(out_dir, "Data", "Intensities", "BaseCalls")
    code = {"A": 0, "C": 1, "G": 2, "T": 3}
    for lane in lanes:
        reads = reads_per_lane[lane]
        n = len(reads)
        pf = (
            pass_filter[lane] if pass_filter and lane in pass_filter
            else np.ones(n, bool)
        )
        ldir = os.path.join(base, f"L{lane:03d}")
        os.makedirs(ldir, exist_ok=True)
        # cluster value per read per cycle
        vals = np.zeros((n, total), np.uint8)
        for r, segs in enumerate(reads):
            cat = "".join(segs)
            assert len(cat) == total
            for c, ch in enumerate(cat):
                vals[r, c] = 0 if ch == "N" else code[ch] | (30 << 2)
        # filter file(s)
        ntile = len(tile4s)
        per_tile = np.array_split(np.arange(n), ntile)
        if mode == "cbcl":
            for ti, t4 in enumerate(tile4s):
                with open(os.path.join(ldir, f"s_{lane}_{t4:04d}.filter"), "wb") as f:
                    f.write(b"\0" * 8 + struct.pack("<I", len(per_tile[ti])))
                    f.write(pf[per_tile[ti]].astype(np.uint8).tobytes())
        else:
            with open(os.path.join(ldir, f"s_{lane}.filter"), "wb") as f:
                f.write(b"\0" * 8 + struct.pack("<I", n))
                f.write(pf.astype(np.uint8).tobytes())
        if mode == "bcl":
            for cyc in range(1, total + 1):
                with open(os.path.join(ldir, f"{cyc:04d}.bcl.gz"), "wb") as f:
                    payload = struct.pack("<I", n) + vals[:, cyc - 1].tobytes()
                    f.write(gzip.compress(payload))
        else:
            for cyc in range(1, total + 1):
                cdir = os.path.join(ldir, f"C{cyc}.1")
                os.makedirs(cdir, exist_ok=True)
                # single surface file, 2-bit qscore mode, bins {0: q0, 1: q30}
                # (bin0→0 so a no-call cluster decodes back to value 0 = N,
                # matching the reference's nch==0 test, input-blc.c:708)
                blobs = []
                theader = b""
                for ti, t4 in enumerate(tile4s):
                    v = vals[per_tile[ti], cyc - 1]
                    qbin = np.where(v >> 2 >= 15, 1, 0).astype(np.uint8)
                    call = (v & 3) | (qbin << 2)
                    # N encoded as call 0 / qbin 0 → value 0 on decode
                    nib = call
                    if len(nib) % 2:
                        nib = np.concatenate([nib, np.zeros(1, np.uint8)])
                    packed = (nib[0::2] | (nib[1::2] << 4)).astype(np.uint8)
                    comp = gzip.compress(packed.tobytes())
                    blobs.append(comp)
                    theader += struct.pack(
                        "<IIII", t4, len(v), len(packed), len(comp)
                    )
                with open(os.path.join(cdir, f"L{lane:03d}_1.cbcl"), "wb") as f:
                    head = struct.pack("<HI", 1, 0) + struct.pack("<BB", 2, 2)
                    head += struct.pack("<I", 2)  # n_bins
                    head += struct.pack("<II", 0, 0) + struct.pack("<II", 1, 30)
                    head += struct.pack("<I", len(tile4s)) + theader
                    head += struct.pack("<B", 0)  # excludeNonPF = 0
                    f.write(head)
                    for b in blobs:
                        f.write(b)
