"""Diagnostic: field-by-field divergence vs the reference binary fixtures.

Usage: python profile_parity.py [se|pe|both]
"""
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).parent))

from subread_tpu.utils.samcompare import load_ref_full, compare_sam_to_ref

DATA = pathlib.Path(__file__).parent / "tests" / "data"


def run_se(al, tmp):
    out = str(tmp / "se.sam")
    al.align_file(str(DATA / "sim20k-chr901.fq.gz"), out)
    ref = load_ref_full(str(DATA / "se20k-chr901.ref-full.tsv.gz"))
    st = compare_sam_to_ref(out, ref)
    print("== SE 20k ==")
    print(st.report())
    return st


def run_pe(al, tmp):
    out = str(tmp / "pe.sam")
    al.align_file_pe(str(DATA / "sim10k-pe-chr901-r1.fq.gz"),
                     str(DATA / "sim10k-pe-chr901-r2.fq.gz"), out)
    ref = load_ref_full(str(DATA / "pe10k-chr901.ref-full.tsv.gz"))
    st = compare_sam_to_ref(out, ref)
    print("== PE 10k ==")
    print(st.report())
    return st


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    from subread_tpu.index.genome import genome_from_fasta
    from subread_tpu.index.build import build_hash_index
    from subread_tpu.align.pipeline import Aligner
    from subread_tpu.config import aligner_config

    genome = genome_from_fasta("/root/reference/test/chr901.fa")
    index = build_hash_index(genome, index_gap=1)
    al = Aligner(genome, index, aligner_config(batch_reads=4096))
    with tempfile.TemporaryDirectory() as d:
        tmp = pathlib.Path(d)
        if which in ("se", "both"):
            run_se(al, tmp)
        if which in ("pe", "both"):
            run_pe(al, tmp)


if __name__ == "__main__":
    main()
