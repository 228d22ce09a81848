"""Reusable DataFrame->DataFrame operators."""

from . import clustering, dedup, merge, multimodal, similarity, text  # noqa: F401
