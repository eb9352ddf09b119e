"""Structure-function estimators and their registry.

``SF_METHODS`` maps method name → calculator class. New estimators register
automatically by subclassing :class:`StructureFunctionCalculator` and being
imported before use (or call :func:`register_sf_subclasses` explicitly).

Parity target:
``/root/reference/src/tape/analysis/structure_function/calculator_registrar.py:1-46``.
"""

from .argument_container import StructureFunctionArgumentContainer
from .base_calculator import StructureFunctionCalculator, compute_dt_bins
from .calculators import (
    BasicStructureFunctionCalculator,
    Bauer2009AStructureFunctionCalculator,
    Bauer2009BStructureFunctionCalculator,
    Macleod2012StructureFunctionCalculator,
    Schmidt2010StructureFunctionCalculator,
)


def _all_subclasses(cls):
    out = set()
    for sub in cls.__subclasses__():
        out.add(sub)
        out |= _all_subclasses(sub)
    return out


def register_sf_subclasses():
    """Build the name → class registry from all imported calculator subclasses."""
    registry = {}
    for sub in _all_subclasses(StructureFunctionCalculator):
        name = sub.name_id()
        if name in registry:
            raise ValueError(
                f"Duplicate structure function calculator name '{name}' from {sub.__name__}"
            )
        registry[name] = sub
    return registry


SF_METHODS = register_sf_subclasses()

__all__ = [
    "SF_METHODS",
    "register_sf_subclasses",
    "StructureFunctionArgumentContainer",
    "StructureFunctionCalculator",
    "compute_dt_bins",
    "BasicStructureFunctionCalculator",
    "Macleod2012StructureFunctionCalculator",
    "Bauer2009AStructureFunctionCalculator",
    "Bauer2009BStructureFunctionCalculator",
    "Schmidt2010StructureFunctionCalculator",
]
