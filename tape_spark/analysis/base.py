"""Self-describing analysis functions for the batch() UDF engine.

An :class:`AnalysisFunction` bundles a per-lightcurve computation with the
metadata ``Ensemble.batch`` needs to plan it on Spark: which source columns
to feed it, what grouping keys to use, and the result schema.

Parity target: ``/root/reference/src/tape/analysis/base.py:11-102``.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import List


class AnalysisFunction(ABC):
    """Base class for analysis functions runnable via ``Ensemble.batch``.

    Subclasses describe their own input columns, grouping keys and output
    schema so that ``batch()`` can build the ``applyInPandas`` plan without
    user-supplied ``meta``.
    """

    @abstractmethod
    def cols(self, ens) -> List[str]:
        """Source columns (in order) passed as positional numpy arrays."""
        raise NotImplementedError

    @abstractmethod
    def meta(self, ens):
        """Result schema in any form accepted by ``Ensemble.batch(meta=...)``:
        a dict ``{name: type}``, a tuple ``(name, type)``, a pandas
        Series/DataFrame prototype, or a Spark ``StructType``/DDL string."""
        raise NotImplementedError

    def on(self, ens) -> List[str]:
        """Grouping key columns; defaults to the object-id column."""
        return [ens._id_col]

    @abstractmethod
    def __call__(self, *cols, **kwargs):
        """Compute over one group. Receives one numpy array per ``cols`` entry."""
        raise NotImplementedError
