"""Diagnose junction recall/precision vs the reference binary's junction.bed.

Dumps missed (ref-only) and extra (ours-only) junctions with per-junction
supporting-read context so the selection gap can be attributed.
"""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import pathlib
import sys

READS = pathlib.Path("/root/reference/test/subjunc/data/junction-reads-A.fq")
GOLDEN = pathlib.Path("tests/data/subjunc-chr901.ref.junction.bed")


def junction_rows(path):
    out = {}
    for line in open(path):
        if line.startswith("#"):
            continue
        f = line.rstrip("\n").split("\t")
        start = int(f[1])
        sizes = f[10].split(",")
        starts = f[11].split(",")
        le = start + int(sizes[0]) - 1
        re = start + int(starts[1])
        out[(f[0], le, re)] = int(f[4])  # supporting reads
    return out


def main():
    from subread_tpu.align.pipeline import Aligner
    from subread_tpu.config import subjunc_config
    from subread_tpu.index.build import build_hash_index
    from subread_tpu.index.genome import genome_from_fasta

    genome = genome_from_fasta("/root/reference/test/chr901.fa")
    index = build_hash_index(genome, index_gap=1)
    al = Aligner(genome, index, subjunc_config(batch_reads=2048))
    out = "/tmp/junc_diag.sam"
    summary = al.align_file(str(READS), out)
    print(f"mapped {summary.mapped}/{summary.total} = "
          f"{summary.mapped/summary.total:.4f}")

    ours = junction_rows(out + ".junction.bed")
    ref = junction_rows(str(GOLDEN))
    both = set(ours) & set(ref)
    missed = {k: ref[k] for k in set(ref) - set(ours)}
    extra = {k: ours[k] for k in set(ours) - set(ref)}
    print(f"ref {len(ref)}  ours {len(ours)}  common {len(both)}")
    print(f"recall {len(both)/len(ref):.4f}  precision {len(both)/max(len(ours),1):.4f}")

    def near(k, other):
        # nearest junction in the other set (same chro)
        best = None
        for k2 in other:
            if k2[0] != k[0]:
                continue
            d = abs(k2[1] - k[1]) + abs(k2[2] - k[2])
            if best is None or d < best[0]:
                best = (d, k2)
        return best

    print("\n--- missed (in ref, not ours), with nearest of ours ---")
    for k in sorted(missed, key=lambda k: -missed[k])[:30]:
        n = near(k, ours)
        print(f"  {k} support={missed[k]} nearest_ours={n}")
    print("\n--- extra (ours, not ref), with nearest of ref ---")
    for k in sorted(extra, key=lambda k: -extra[k])[:30]:
        n = near(k, ref)
        print(f"  {k} support={extra[k]} nearest_ref={n}")


if __name__ == "__main__":
    main()
