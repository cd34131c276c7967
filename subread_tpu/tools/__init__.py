"""CLI front-ends mirroring the reference binaries (SURVEY.md §1 L4).

Each module exposes main(argv) and is runnable via
``python -m subread_tpu.tools.<name>``:

  buildindex   ≙ subread-buildindex  (core-interface: index-builder.c:1014)
  align        ≙ subread-align       (core-interface-aligner.c)
  subjunc      ≙ subjunc             (core-interface-subjunc.c)
  featurecounts≙ featureCounts       (readSummary.c:8859)
  exactsnp     ≙ exactSNP            (SNPCalling.c:1583)
"""
