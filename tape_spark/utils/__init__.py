"""Utility helpers: column-role mapping and expression translation."""

from .column_mapper import ColumnMapper, PS1ColumnMapper, ZTFColumnMapper

__all__ = ["ColumnMapper", "ZTFColumnMapper", "PS1ColumnMapper"]
