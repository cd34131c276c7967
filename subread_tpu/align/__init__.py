"""Aligner core: the chunked two-scan pipeline (reference L3, core.c)."""

from .pipeline import Aligner, AlignSummary

__all__ = ["Aligner", "AlignSummary"]
