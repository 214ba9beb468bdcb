"""Declarative parameter-sweep harness.

Equivalent of the reference's demo/common.py Experiment class: sweep XML
paths over value grids, collect getter results, cache each run keyed by the
project-XML hash, and dump a flat result table.
"""
from __future__ import annotations

import hashlib
import itertools
import json
import os
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from .api import FG
from .utils.logging import LOG


# getter key -> FG accessor
_RESULT_GETTERS: Dict[str, Callable[[FG], object]] = {
    "effective_property": lambda fg: fg.get_effective_property(),
    "mean_stress": lambda fg: fg.get_mean_stress(),
    "mean_strain": lambda fg: fg.get_mean_strain(),
    "mean_energy": lambda fg: fg.get_mean_energy(),
    "mean_cauchy_stress": lambda fg: fg.get_mean_cauchy_stress(),
    "residuals": lambda fg: fg.get_residuals(),
    "num_iterations": lambda fg: len(fg.get_residuals()),
    "solve_time": lambda fg: fg.get_solve_time(),
    "A2": lambda fg: fg.get_A2(),
    "error": lambda fg: fg.get_error(),
}


class Experiment:
    """Parameter sweep over an XML project.

    ex = Experiment("project.xml", results_dat="out.json")
    ex.add_param("solver..n", [16, 32, 64])
    ex.add_param("solver.tol", [1e-6])
    ex.add_result("effective_property")
    table = ex.run()
    """

    def __init__(self, project_xml: str, results_dat: Optional[str] = None,
                 cache_dir: Optional[str] = None):
        self.project_xml = project_xml
        self.results_dat = results_dat
        self.cache_dir = cache_dir
        self.parameters: List[tuple] = []
        self.results: List[tuple] = []
        self.info: Dict[str, object] = {}

    def add_info(self, key, value):
        self.info[key] = value

    def add_param(self, path: str, values: Sequence, record: bool = True):
        """Sweep `path` over `values` (outer product with other params)."""
        self.parameters.append((path, list(values), record))
        return self

    def add_result(self, key: str, getter: Callable[[FG], object] = None):
        """Record a result per run; key is one of the standard getters or a
        custom callable fg -> value."""
        if getter is None:
            if key not in _RESULT_GETTERS:
                raise ValueError(f"Unknown result key '{key}'; pass a getter")
            getter = _RESULT_GETTERS[key]
        self.results.append((key, getter))
        return self

    def add_results(self, keys):
        for k in keys:
            self.add_result(k)
        return self

    # ------------------------------------------------------------------ run
    def _cache_path(self, xml: str):
        if self.cache_dir is None:
            return None
        h = hashlib.sha256(xml.encode()).hexdigest()[:24]
        return os.path.join(self.cache_dir, f"run_{h}.json")

    def run(self, dry: bool = False, cache_only: bool = False) -> List[dict]:
        """Run the full sweep; returns a list of row dicts."""
        if isinstance(self.project_xml, str) and os.path.exists(self.project_xml):
            with open(self.project_xml) as f:
                base_xml = f.read()
            base_dir = os.path.dirname(os.path.abspath(self.project_xml))
        else:
            base_xml = self.project_xml
            base_dir = None

        grids = [p[1] for p in self.parameters]
        rows = []
        for combo in itertools.product(*grids) if grids else [()]:
            fg = FG()
            fg.set_xml(base_xml)
            if base_dir:
                fg._xml_dir = base_dir
            row = dict(self.info)
            for (path, _, record), value in zip(self.parameters, combo):
                fg.set(path, value)
                if record:
                    row[path] = value
            xml = fg.get_xml()
            cache = self._cache_path(xml)
            if cache and os.path.exists(cache):
                with open(cache) as f:
                    row.update(json.load(f))
                rows.append(row)
                continue
            if dry or cache_only:
                if not cache_only:
                    LOG.info(f"dry run: {row}")
                rows.append(row)
                continue
            fg.run()
            data = {}
            for key, getter in self.results:
                try:
                    data[key] = getter(fg)
                except Exception as e:  # noqa: BLE001
                    data[key] = None
                    LOG.warn(f"result '{key}' failed: {e}")
            if cache:
                os.makedirs(self.cache_dir, exist_ok=True)
                with open(cache, "w") as f:
                    json.dump(data, f)
            row.update(data)
            rows.append(row)

        if self.results_dat:
            with open(self.results_dat, "w") as f:
                json.dump(rows, f, indent=1, default=_jsonable)
        return rows


def _jsonable(v):
    if isinstance(v, np.ndarray):
        return v.tolist()
    if isinstance(v, (np.floating, np.integer)):
        return v.item()
    return str(v)
