"""Local single-light-curve container with analysis entry points.

A ``TimeSeries`` is one object's observations materialized on the driver
as a pandas DataFrame with a ``(band, index)`` MultiIndex — produced by
``Ensemble.to_timeseries`` (``source.filter(id == x).toPandas()``).

Parity target: ``/root/reference/src/tape/timeseries.py:7-202``.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd


class TimeSeries:
    """One light curve in memory, indexed ``(band, per-band ordinal)``.

    Column roles (time/flux/flux_err) are tracked in ``colmap``; the object
    id (if known) in ``meta['id']``.
    """

    def __init__(self, data: Optional[pd.DataFrame] = None):
        self.data = data
        self.meta = {"id": None}
        self.colmap = {"time": None, "flux": None, "flux_err": None}

    @staticmethod
    def _band_index(bands) -> pd.MultiIndex:
        """(band, running ordinal within that band) MultiIndex."""
        seen: dict = {}
        ordinals = []
        for b in bands:
            k = seen.get(b, 0)
            ordinals.append(k)
            seen[b] = k + 1
        return pd.MultiIndex.from_arrays([list(bands), ordinals], names=["band", "index"])

    def _apply_colmap(self, time_label, flux_label, err_label):
        for quantity, label in (("time", time_label), ("flux", flux_label), ("flux_err", err_label)):
            if quantity == "flux_err" and label is None:
                continue  # error column is optional
            if label not in self.data.columns:
                raise KeyError(f"The indicated label '{label}' was not found.")
            self.colmap[quantity] = label

    def from_dict(
        self,
        data_dict: dict,
        time_label: str = "time",
        flux_label: str = "flux",
        err_label: Optional[str] = "flux_err",
        band_label: str = "band",
    ) -> "TimeSeries":
        """Build from a dict of columns; the band column becomes the index."""
        if band_label not in data_dict:
            raise KeyError(f"The indicated label '{band_label}' was not found.")
        index = self._band_index(data_dict[band_label])
        body = {k: v for k, v in data_dict.items() if k != band_label}
        self.data = pd.DataFrame(body, index=index).sort_index()
        self._apply_colmap(time_label, flux_label, err_label)
        return self

    def from_dataframe(
        self,
        data: pd.DataFrame,
        object_id,
        time_label: str = "time",
        flux_label: str = "flux",
        err_label: Optional[str] = "flux_err",
        band_label: str = "band",
    ) -> "TimeSeries":
        """Adopt a pandas DataFrame as this object's light curve."""
        self.data = data.copy()
        self.meta["id"] = object_id
        self.data.index = self._band_index(self.data[band_label])
        self._apply_colmap(time_label, flux_label, err_label)
        return self

    def dropna(self, **kwargs) -> "TimeSeries":
        """Drop NaN rows (pandas ``dropna`` pass-through)."""
        self.data = self.data.dropna(**kwargs)
        return self

    @property
    def time(self) -> pd.Series:
        return self.data[self.colmap["time"]]

    @property
    def flux(self) -> pd.Series:
        return self.data[self.colmap["flux"]]

    @property
    def flux_err(self) -> Optional[pd.Series]:
        if self.colmap["flux_err"] is not None:
            return self.data[self.colmap["flux_err"]]
        return None

    @property
    def band(self) -> pd.Index:
        return self.data.index.get_level_values("band")

    def stetson_J(self, band=None) -> dict:
        """Stetson J per band (all bands when ``band`` is None)."""
        from .analysis.stetson import calc_stetson_J

        return calc_stetson_J(self.flux, self.flux_err, self.band, band_to_calc=band)

    def sf2(self, sf_method: str = "basic", argument_container=None) -> pd.DataFrame:
        """Structure function squared over this curve's bands."""
        from .analysis.structurefunction2 import calc_sf2

        lc_id = [self.meta["id"] if self.meta["id"] is not None else 0] * len(self.time)
        return calc_sf2(
            time=self.time,
            flux=self.flux,
            err=self.flux_err,
            band=self.band,
            lc_id=lc_id,
            sf_method=sf_method,
            argument_container=argument_container,
        )
