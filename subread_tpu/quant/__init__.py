"""Quantification & downstream analysis (reference L5): featureCounts,
exactSNP, cellCounts."""
