"""Workspace / project management + script execution — the console's
``workspacehandling`` and ``scripting`` analog.

Reference parity surface:

- ``console/src/main/scala/io/shiftleft/console/workspacehandling/
  Workspace.scala`` — a workspace is a directory of project directories;
- ``Project.scala:15-49`` — a project is ``{project.json(inputPath, name),
  persistent CPG, overlays/}`` and renders as a table row
  ``(name, overlays, inputPath, loaded)``; here the persistent graph is the
  pipeline's overlay warehouse (``plans/pipeline.Catalog`` — commit-marked
  parquet overlay dirs, the ``cpg.bin`` + ``overlays/`` pair in one store);
- ``WorkspaceLoader.scala:19-27`` — scan the workspace dir and
  re-materialize each project from its project file;
- ``WorkspaceManager.scala:30-410`` — create/open/close/set-active/delete/
  reset, ``cpg`` (the active project's graph), ``getNextOverlayDirName``;
- ``scripting/ScriptManager.scala:125-131`` + ``AmmoniteExecutor.scala:
  37-100`` — run script files over a bound graph with named parameters.

Trust model: scripts are Python executed in-process with the graph bound —
the same eval-based model as the kgql REPL/HTTP server (see
``tools/kgql_server.py``'s shared-secret gate); never run untrusted script
files.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from .pipeline import Catalog, run_pipeline

PROJECT_FILE = "project.json"
WAREHOUSE_DIR = "warehouse"


@dataclass
class Project:
    """``Project.scala:21`` analog: name + input path + on-disk location +
    the loaded graph handle (``None`` when not open)."""

    name: str
    input_path: str
    path: str
    catalog: Catalog | None = field(default=None, repr=False)

    @property
    def is_open(self) -> bool:
        return self.catalog is not None

    @property
    def warehouse(self) -> str:
        return os.path.join(self.path, WAREHOUSE_DIR)

    def applied_overlays(self) -> list[str]:
        """``Project.appliedOverlays`` — overlay names recorded in the
        LOADED graph (empty when the project is closed)."""
        return self.catalog.overlay_names() if self.catalog else []

    def available_overlays(self) -> list[str]:
        """``Project.availableOverlays`` — overlay dirs present on disk,
        loaded or not."""
        d = os.path.join(self.warehouse, "overlays")
        return sorted(os.listdir(d)) if os.path.isdir(d) else []

    def to_table_row(self) -> list[str]:
        """``Project.toTableRow`` — (name, overlays, inputPath, loaded)."""
        return [
            self.name,
            ",".join(self.available_overlays()),
            self.input_path,
            str(self.is_open),
        ]


def _load_workspace(path: str) -> list[Project]:
    """``WorkspaceLoader.load`` analog: every subdirectory carrying a
    project file is a project (unparseable entries are skipped, as the
    reference loader tolerates)."""
    out: list[Project] = []
    if not os.path.isdir(path):
        return out
    for entry in sorted(os.listdir(path)):
        pdir = os.path.join(path, entry)
        pfile = os.path.join(pdir, PROJECT_FILE)
        if not os.path.isfile(pfile):
            continue
        try:
            with open(pfile) as fh:
                meta = json.load(fh)
            out.append(
                Project(name=meta["name"], input_path=meta["inputPath"], path=pdir)
            )
        except (json.JSONDecodeError, KeyError):
            continue
    return out


class WorkspaceManager:
    """``WorkspaceManager.scala:30`` analog over pipeline warehouses."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path)
        os.makedirs(self.path, exist_ok=True)
        self._projects: list[Project] = _load_workspace(self.path)
        self._active: str | None = None

    # -- listing (WorkspaceManager.scala:131-137) ---------------------------

    @property
    def projects(self) -> list[Project]:
        return list(self._projects)

    @property
    def number_of_projects(self) -> int:
        return len(self._projects)

    def project(self, name: str) -> Project | None:
        return next((p for p in self._projects if p.name == name), None)

    def project_exists(self, name: str) -> bool:
        return self.project(name) is not None

    def graph_exists(self, name: str) -> bool:
        """``cpgExists`` analog: the project's warehouse holds at least one
        committed overlay (commit markers are the persistence unit)."""
        p = self.project(name)
        if p is None:
            return False
        return bool(Catalog(self.spark, p.warehouse).committed_overlays())

    def __str__(self) -> str:  # Workspace.toString table
        rows = [p.to_table_row() for p in self._projects]
        return "\n".join("\t".join(r) for r in rows)

    # -- creation (createProject:54-109, importCode semantics) --------------

    def create_project(self, input_path: str, name: str) -> Project:
        """Create (or overwrite — ``createProject:54``'s removeProject-first
        discipline) a project and BUILD its graph: run the full pass
        pipeline over ``input_path``'s ``transcripts.parquet`` +
        ``alias_dict.parquet`` into the project warehouse — the console's
        ``importCode`` → base CPG + overlay creation flow."""
        if self.project_exists(name):
            self.delete_project(name)
        pdir = os.path.join(self.path, name)
        os.makedirs(pdir, exist_ok=True)
        with open(os.path.join(pdir, PROJECT_FILE), "w") as fh:
            json.dump({"name": name, "inputPath": os.path.abspath(input_path)}, fh)
        proj = Project(name=name, input_path=os.path.abspath(input_path), path=pdir)
        tr = self.spark.read.parquet(os.path.join(input_path, "transcripts.parquet"))
        ad = self.spark.read.parquet(os.path.join(input_path, "alias_dict.parquet"))
        proj.catalog = run_pipeline(self.spark, tr, ad, proj.warehouse)
        self._projects.append(proj)
        self._active = name
        return proj

    # -- open / close / active (openProject:279, closeProject:317,
    #    setActiveProject:249, getActiveProject:266, cpg:233) ---------------

    def open_project(self, name: str) -> Project | None:
        p = self.project(name)
        if p is None:
            return None
        if p.catalog is None:
            p.catalog = Catalog(self.spark, p.warehouse)
        self._active = name
        return p

    def close_project(self, name: str) -> Project | None:
        """Drop the loaded handle. The reference's close promotes the
        working copy to the persistent CPG (``Project.close``); here every
        overlay is already durable at commit time (commit-marker
        discipline), so close is purely a handle release."""
        p = self.project(name)
        if p is None:
            return None
        p.catalog = None
        if self._active == name:
            self._active = None
        return p

    def set_active_project(self, name: str) -> Project | None:
        p = self.project(name)
        if p is not None:
            self._active = name
        return p

    def get_active_project(self) -> Project | None:
        return self.project(self._active) if self._active else None

    @property
    def cpg(self) -> Catalog:
        """The active project's loaded graph (``WorkspaceManager.cpg:233``
        raises when nothing is active/loaded, as the reference does)."""
        p = self.get_active_project()
        if p is None or p.catalog is None:
            raise RuntimeError(
                "No project is open — create_project/open_project first"
            )
        return p.catalog

    # -- overlay naming (getNextOverlayDirName:218) -------------------------

    def get_next_overlay_dir_name(self, name: str, overlay_name: str) -> str:
        """Next int-prefixed overlay dir for the named project — the same
        ``{index}_{name}`` numbering ``Catalog._overlay_dir`` commits and
        ``SerializedCpg.scala:45-60`` writes as zip entries."""
        p = self.project(name)
        if p is None:
            raise KeyError(name)
        idx = len(Catalog(self.spark, p.warehouse).committed_overlays())
        return f"{idx:02d}_{overlay_name}"

    # -- removal (removeProject:73, deleteProject:400, reset:111) -----------

    def remove_project(self, name: str) -> None:
        """Forget the project in this manager WITHOUT touching disk."""
        self.close_project(name)
        self._projects = [p for p in self._projects if p.name != name]

    def delete_project(self, name: str) -> None:
        """Remove the project AND its directory."""
        p = self.project(name)
        self.remove_project(name)
        if p is not None and os.path.isdir(p.path):
            shutil.rmtree(p.path)

    def reset(self) -> None:
        """``reset:111`` — wipe the whole workspace dir and start empty."""
        self._active = None
        self._projects = []
        shutil.rmtree(self.path, ignore_errors=True)
        os.makedirs(self.path, exist_ok=True)


# ---------------------------------------------------------------------------
# Script execution (ScriptManager.scala:125-131 / AmmoniteExecutor.scala:
# 37-100 analog): run a Python script file with the graph + parameters bound.
# ---------------------------------------------------------------------------


def run_script(graph_view, script_path: str, parameters: dict | None = None):
    """Execute a script file over a bound graph and return its result.

    Binding contract (the ``bindings`` of ``AmmoniteExecutor.runScript:37``):
    the script sees ``g`` (the graph — a ``GraphView`` or ``Catalog``),
    ``F`` (pyspark.sql.functions), ``S`` (schema constants) and ``params``
    (the parameter dict, ``@main`` arguments in the reference). The result
    is, in order of preference: the value returned by a ``run(g, params)``
    function the script defines, else the script's top-level ``result``
    variable, else ``None``."""
    from pyspark.sql import functions as F

    from .. import schema as S

    with open(script_path) as fh:
        src = fh.read()
    ns: dict = {
        "g": graph_view,
        "F": F,
        "S": S,
        "params": dict(parameters or {}),
    }
    code = compile(src, script_path, "exec")
    exec(code, ns)  # noqa: S102 — documented trust model (module docstring)
    if callable(ns.get("run")):
        return ns["run"](graph_view, ns["params"])
    return ns.get("result")


def run_scripts(
    graph_view, script_paths: list[str], parameters: dict | None = None
) -> list:
    """``AmmoniteExecutor.runScripts:78`` — run in order, collect results."""
    return [run_script(graph_view, p, parameters) for p in script_paths]
