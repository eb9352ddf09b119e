"""Column-role mapping for the Ensemble data model.

A light-curve source table needs five critical columns: object id, time,
flux (or magnitude), flux error, and band. ``ColumnMapper`` records which
user column plays which role.

Parity target: ``/root/reference/src/tape/utils/column_mapper/column_mapper.py``
(roles at :37-51, readiness check :82-110, known survey maps :156-193).
"""

from __future__ import annotations

from typing import Optional

ROLES = ("id_col", "time_col", "flux_col", "err_col", "band_col")


class ColumnMapper:
    """Maps user column names onto the five critical roles.

    All five roles are required before an Ensemble can be constructed.

    Parameters
    ----------
    id_col, time_col, flux_col, err_col, band_col : str, optional
        Column names for each role. Any left unset can be assigned later
        via :meth:`assign`.
    """

    def __init__(
        self,
        id_col: Optional[str] = None,
        time_col: Optional[str] = None,
        flux_col: Optional[str] = None,
        err_col: Optional[str] = None,
        band_col: Optional[str] = None,
    ):
        self.map = {
            "id_col": id_col,
            "time_col": time_col,
            "flux_col": flux_col,
            "err_col": err_col,
            "band_col": band_col,
        }

    def __repr__(self):
        inner = ", ".join(f"{k}={v!r}" for k, v in self.map.items())
        return f"ColumnMapper({inner})"

    @property
    def ready(self) -> bool:
        """True when every critical role has a column assigned."""
        return all(self.map.get(role) is not None for role in ROLES)

    def is_ready(self, show_needed: bool = False):
        """Check readiness; optionally return the list of missing roles."""
        needed = [role for role in ROLES if self.map.get(role) is None]
        if show_needed:
            return not needed, needed
        return not needed

    def assign(self, **roles) -> "ColumnMapper":
        """Assign or overwrite role→column mappings.

        Accepts any of the five role keywords (``id_col=...`` etc.);
        unknown keywords raise ``ValueError``.
        """
        for role, col in roles.items():
            if role not in ROLES:
                raise ValueError(f"Unknown column role: {role!r}; expected one of {ROLES}")
            if col is not None:
                self.map[role] = col
        return self

    @classmethod
    def from_known_map(cls, name: str, hipscat: bool = False) -> "ColumnMapper":
        """Construct a mapper for a known survey layout (``'ztf'`` or ``'ps1'``)."""
        name = name.lower()
        if name not in KNOWN_MAPS:
            raise ValueError(f"Unknown survey map {name!r}; available: {sorted(KNOWN_MAPS)}")
        roles = dict(KNOWN_MAPS[name])
        if hipscat:
            roles["id_col"] = "_hipscat_index"
        return cls(**roles)

    def use_known_map(self, name: str, hipscat: bool = False) -> "ColumnMapper":
        """Adopt a known survey mapping in place (parity with the
        reference's ``use_known_map``, ``column_mapper.py:112-135``)."""
        known = type(self).from_known_map(name, hipscat=hipscat)
        return self.assign(**known.map)


# Known survey column layouts (public catalog schemas; values match the
# reference's ZTFColumnMapper/PS1ColumnMapper).
KNOWN_MAPS = {
    "ztf": {
        "id_col": "ps1_objid",
        "time_col": "mjd",
        "flux_col": "mag",
        "err_col": "magerr",
        "band_col": "band",
    },
    "ps1": {
        "id_col": "objID",
        "time_col": "obsTime",
        "flux_col": "apFlux",
        "err_col": "apFluxErr",
        "band_col": "filterID",
    },
}


class ZTFColumnMapper(ColumnMapper):
    """Pre-configured mapper for Zwicky Transient Facility catalogs."""

    def __init__(self, hipscat: bool = False):
        roles = dict(KNOWN_MAPS["ztf"])
        if hipscat:
            roles["id_col"] = "_hipscat_index"
        super().__init__(**roles)


class PS1ColumnMapper(ColumnMapper):
    """Pre-configured mapper for Pan-STARRS (PS1) catalogs."""

    def __init__(self, hipscat: bool = False):
        roles = dict(KNOWN_MAPS["ps1"])
        if hipscat:
            roles["id_col"] = "_hipscat_index"
        super().__init__(**roles)
