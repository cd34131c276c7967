"""Record-level conformance vs the reference aligner binary.

Fixtures: tests/data/sim20k-chr901.fq.gz (20k simulated 100bp reads,
1% error, 10% indels) and the first 6 SAM columns of the output of the
compiled reference subread-align v2.0.6 (`--SAMoutput -t1 -T1` against a
`-B -F` chr901 index).
"""

import gzip
import pathlib

import pytest

jax = pytest.importorskip("jax")

HERE = pathlib.Path(__file__).parent
FQ = HERE / "data" / "sim20k-chr901.fq.gz"
REF = HERE / "data" / "sim20k-chr901.ref-align.tsv.gz"


def test_position_agreement_with_reference(tmp_path, chr901_genome, chr901_index):
    from subread_tpu.align.pipeline import Aligner
    from subread_tpu.config import aligner_config

    al = Aligner(chr901_genome, chr901_index, aligner_config(batch_reads=2048))
    out = tmp_path / "ours.sam"
    al.align_file(str(FQ), str(out))

    ref = {}
    with gzip.open(REF, "rt") as f:
        for line in f:
            q, flag, rname, pos, _mapq, _cigar = line.rstrip("\n").split("\t")
            ref[q] = (int(flag) & 0x4, rname, int(pos))

    both = agree = ref_only = ours_only = 0
    for line in open(out):
        if line.startswith("@"):
            continue
        fds = line.split("\t")
        r = ref.get(fds[0])
        if r is None:
            continue
        ours_unmapped = bool(int(fds[1]) & 0x4)
        if r[0] and ours_unmapped:
            continue
        if r[0]:
            ours_only += 1
            continue
        if ours_unmapped:
            ref_only += 1
            continue
        both += 1
        if r[1] == fds[2] and abs(r[2] - int(fds[3])) <= 5:
            agree += 1

    assert both > 17000, f"both-mapped too low: {both}"
    rate = agree / both
    assert rate >= 0.99, f"position agreement {rate:.4f} ({agree}/{both})"
    # we should not lose many reads the reference maps
    assert ref_only < 400, f"reference-only mapped: {ref_only}"


PE_R1 = HERE / "data" / "sim10k-pe-chr901-r1.fq.gz"
PE_R2 = HERE / "data" / "sim10k-pe-chr901-r2.fq.gz"
PE_REF = HERE / "data" / "sim10k-pe-chr901.ref-align.tsv.gz"


def test_pe_position_agreement_with_reference(tmp_path, chr901_genome,
                                              chr901_index):
    """PE record-level conformance: 10k simulated pairs (1% error, 10%
    indels) vs the reference binary run with -r/-R -t1 --SAMoutput."""
    from subread_tpu.align.pipeline import Aligner
    from subread_tpu.config import aligner_config

    al = Aligner(chr901_genome, chr901_index, aligner_config(batch_reads=2048))
    out = tmp_path / "ours.sam"
    al.align_file_pe(str(PE_R1), str(PE_R2), str(out))

    ref = {}
    with gzip.open(PE_REF, "rt") as f:
        for line in f:
            q, flag, rname, pos, _mapq, _cigar = line.rstrip("\n").split("\t")
            which = 1 if int(flag) & 0x40 else 2
            ref[(q, which)] = (int(flag) & 0x4, rname, int(pos))

    both = agree = ref_only = 0
    for line in open(out):
        if line.startswith("@"):
            continue
        fds = line.split("\t")
        which = 1 if int(fds[1]) & 0x40 else 2
        r = ref.get((fds[0], which))
        if r is None:
            continue
        ours_unmapped = bool(int(fds[1]) & 0x4)
        if r[0]:
            continue
        if ours_unmapped:
            ref_only += 1
            continue
        both += 1
        if r[1] == fds[2] and abs(r[2] - int(fds[3])) <= 5:
            agree += 1

    assert both > 18000, f"both-mapped too low: {both}"
    rate = agree / both
    assert rate >= 0.98, f"PE position agreement {rate:.4f} ({agree}/{both})"
    assert ref_only < 400, f"reference-only mapped: {ref_only}"


# --- record-level parity gates (samcompare over the FULL-record fixtures:
# FLAG/POS/MAPQ/CIGAR/TLEN/NM), ratcheted to the measured rates of the
# two-grid exact-vote kernel.  Residue at the gates (documented in
# PROGRESS notes): SE = shared-event indel CIGAR ties (~23 reads) + vote
# round-2 cases; PE adds pair-selection ties and mate-rescue cases.

SE_FULL = HERE / "data" / "se20k-chr901.ref-full.tsv.gz"
PE_FULL = HERE / "data" / "pe10k-chr901.ref-full.tsv.gz"


def test_se_full_record_parity(tmp_path, chr901_genome, chr901_index):
    from subread_tpu.align.pipeline import Aligner
    from subread_tpu.config import aligner_config
    from subread_tpu.utils.samcompare import load_ref_full, compare_sam_to_ref

    al = Aligner(chr901_genome, chr901_index, aligner_config(batch_reads=2048))
    out = tmp_path / "se.sam"
    al.align_file(str(FQ), str(out))
    st = compare_sam_to_ref(str(out), load_ref_full(str(SE_FULL)))
    assert st.full_rate >= 0.9985, f"SE full-record parity {st.full_rate:.4f}"
    assert st.core_rate >= 0.9985, f"SE core parity {st.core_rate:.4f}"
    assert st.ref_only_mapped <= 40, f"ref-only mapped {st.ref_only_mapped}"


def test_pe_full_record_parity(tmp_path, chr901_genome, chr901_index):
    from subread_tpu.align.pipeline import Aligner
    from subread_tpu.config import aligner_config
    from subread_tpu.utils.samcompare import load_ref_full, compare_sam_to_ref

    al = Aligner(chr901_genome, chr901_index, aligner_config(batch_reads=2048))
    out = tmp_path / "pe.sam"
    al.align_file_pe(str(PE_R1), str(PE_R2), str(out))
    st = compare_sam_to_ref(str(out), load_ref_full(str(PE_FULL)))
    assert st.full_rate >= 0.9940, f"PE full-record parity {st.full_rate:.4f}"
    assert st.core_rate >= 0.9955, f"PE core parity {st.core_rate:.4f}"
    assert st.ref_only_mapped <= 40, f"ref-only mapped {st.ref_only_mapped}"


FQ250 = HERE / "data" / "sim8k-250bp-chr901.fq.gz"
REF250 = HERE / "data" / "sim8k-250bp-chr901.ref-align.tsv.gz"


def test_250bp_position_agreement_with_reference(tmp_path, chr901_genome,
                                                 chr901_index):
    """>160bp reads probe the 6bp ladder (applied_subreads, core.c:3118-3129;
    40 probes at 250bp) and the -M mismatch cap scales per 100bp
    (core-junction.c:3359-3362).  Fixture: the reference binary on 8k
    simulated 250bp reads at 1% error (VERDICT round-2 task 9)."""
    from subread_tpu.align.pipeline import Aligner
    from subread_tpu.config import aligner_config

    al = Aligner(chr901_genome, chr901_index,
                 aligner_config(batch_reads=2048, pad_read_len=256))
    out = tmp_path / "ours.sam"
    summary = al.align_file(str(FQ250), str(out))

    ref = {}
    with gzip.open(REF250, "rt") as f:
        for line in f:
            q, flag, rname, pos, _mq, _cig = line.rstrip("\n").split("\t")
            ref[q] = (int(flag) & 0x4, rname, int(pos))
    both = agree = ref_only = 0
    for line in open(out):
        if line.startswith("@"):
            continue
        fds = line.split("\t")
        r = ref.get(fds[0])
        if r is None or r[0]:
            continue
        if int(fds[1]) & 0x4:
            ref_only += 1
            continue
        both += 1
        if r[1] == fds[2] and abs(r[2] - int(fds[3])) <= 5:
            agree += 1
    assert both > 7500, both
    assert agree / both >= 0.99, f"{agree}/{both}"
    assert ref_only < 80, ref_only


SE_GAP_FULL = HERE / "data" / "se20k-chr901-gap.ref-full.tsv.gz"


def test_gapped_index_se_full_record_parity(tmp_path, chr901_genome):
    """SE parity on the GAPPED index (index_gap=3) — the reference's
    default mode for real genomes (index-builder.c default; memory table
    doc/SubreadUsersGuide.tex:570-573).  Fixture: the reference binary on
    the same reads over `subread-buildindex` (no -F).  Voting probes all
    3 gap phases with the nominal offset snapped to the gap grid
    (core.c:3161-3182), and the event-placement windows collapse probes
    to nominal subread numbers (find_new_indels, core-indel.c:1874-1906)."""
    from subread_tpu.align.pipeline import Aligner
    from subread_tpu.config import aligner_config
    from subread_tpu.index.build import build_hash_index
    from subread_tpu.utils.samcompare import load_ref_full, compare_sam_to_ref

    idx = build_hash_index(chr901_genome, index_gap=3)
    al = Aligner(chr901_genome, idx, aligner_config(batch_reads=2048))
    out = tmp_path / "se-gap.sam"
    al.align_file(str(FQ), str(out))
    st = compare_sam_to_ref(str(out), load_ref_full(str(SE_GAP_FULL)))
    assert st.full_rate >= 0.998, f"gapped SE full parity {st.full_rate:.4f}"
    assert st.core_rate >= 0.998, f"gapped SE core parity {st.core_rate:.4f}"
    assert st.ref_only_mapped <= 40, f"ref-only mapped {st.ref_only_mapped}"
