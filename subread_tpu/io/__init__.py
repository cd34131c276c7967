"""I/O layer: decoders/encoders for the file formats the reference supports.

Reference L1 equivalents (SURVEY.md §1): FASTA/FASTQ(+gz) read sources
(input-files.c), SAM/BAM codec (sambam-file.c), GTF/SAF annotation parsing
(HelperFunctions.c:1077), VCF output.  All host-side, numpy-vectorised where
it matters; the device only ever sees dense integer tensors.
"""
