"""User-packaged algorithm loading — the ``load_app`` / ``AppAssets``
analog (reference: python/graphscope/framework/app.py:149-326, where
``load_app(gar=...)`` unpacks an archive of user algorithm sources and
returns a runnable ``AppAssets``).

Here a "package" is ordinary Python: a single ``.py`` file, a directory
of modules, or a ``.gar``/``.zip`` archive of them.  ``load_app``
imports the sources, finds classes decorated with :func:`~graphscope_
spark.pie.pie` (PEval/IncEval contract) or :func:`pregel_program`
(Init/Compute contract below), and wraps each in an :class:`App` that
runs through the existing engines (:func:`~graphscope_spark.pie.run_pie`
/ :func:`~graphscope_spark.pregel.pregel`) — the "compile" step the
reference does through Cython→C++ is Catalyst here, so loading an app
is just importing declarative plan builders.

No sandboxing is attempted (none exists in the reference either — a
.gar is arbitrary code the coordinator compiles and runs).
"""

from __future__ import annotations

import importlib.util
import inspect
import os
import sys
import tempfile
import zipfile
from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import Graph

PREGEL_NECESSARY_DEFS = ("Init", "Compute")


def pregel_program(vd_type: str = "double", md_type: str = "double"):
    """Class-decorator twin of the reference's ``@pregel`` (analytical/
    udf/decorators.py:124-160): the class must define ``Init`` and
    ``Compute``; ``Combine`` and ``Message`` are optional.

    Methods return **column expressions** (the declarative analog of
    the reference's imperative vertex program):

    - ``Init(v, context)`` → initial vertex ``value`` expression
    - ``Message(edge, context)`` → message expression over edge columns
      + source ``value`` (defaults to relaying ``value + weight``)
    - ``Combine(messages)`` → aggregate callable (defaults to ``F.min``,
      the reference's most common combiner)
    - ``Compute(messages, v, context)`` → new ``value`` expression over
      ``value`` and combined ``msg``
    """

    def _wrapper(algo):
        if hasattr(algo, "__decorated__"):
            raise RuntimeError("Can't decorate on decorated class.")
        if not inspect.isclass(algo):
            raise ValueError(
                'The decorator "pregel_program" must be used on a class definition'
            )
        for need in PREGEL_NECESSARY_DEFS:
            member = getattr(algo, need, None)
            if member is None or not inspect.isroutine(member):
                raise ValueError(
                    f"Pregel program missing necessary definition: {need}"
                )
        # The reference rejects instance-method programs at decoration
        # time ("Missing staticmethod decorator",
        # python/graphscope/analytical/udf/decorators.py
        # _check_and_reorder); App.__call__ invokes these as unbound
        # class attributes, so an instance-style ``def Init(self, v,
        # context)`` would otherwise fail later with an opaque
        # TypeError.  Check every method the runner calls unbound.
        for name in (*PREGEL_NECESSARY_DEFS, "Message", "Combine"):
            if name in algo.__dict__ and not isinstance(
                algo.__dict__[name], staticmethod
            ):
                raise ValueError(
                    f"Missing staticmethod decorator on method {name}"
                )
        algo.__decorated__ = "pregel"
        algo.__pregel_types__ = (vd_type, md_type)
        return algo

    return _wrapper


class _PregelContext:
    def __init__(self, config: dict | None):
        self._config = dict(config or {})

    def get_config(self, key: str, default=None):
        return self._config.get(key, default)


class App:
    """A runnable loaded algorithm (the ``AppAssets`` analog).

    Call it with a :class:`Graph` (plus per-run ``config`` kwargs) to
    execute; returns the (vid, value) result DataFrame.
    """

    def __init__(self, algo, kind: str, source: str):
        self.algo = algo
        self.kind = kind  # "pie" | "pregel"
        self.source = source
        self.name = algo.__name__

    def __repr__(self) -> str:  # pragma: no cover
        return f"App({self.name}, kind={self.kind}, source={self.source!r})"

    def __call__(
        self,
        g: Graph,
        config: dict | None = None,
        max_iter: int = 200,
        checkpoint_dir: str | None = None,
    ) -> DataFrame:
        if self.kind == "pie":
            from graphscope_spark.pie import run_pie

            return run_pie(
                g,
                self.algo,
                config=config,
                max_iter=max_iter,
                checkpoint_dir=checkpoint_dir,
                name=f"app_{self.name.lower()}",
            )
        from graphscope_spark.pregel import pregel

        ctx = _PregelContext(config)
        init = self.algo.Init(g.vertices, ctx)
        message = (
            self.algo.Message(g.edges, ctx)
            if hasattr(self.algo, "Message")
            else F.col("value") + F.col("weight")
        )
        combine: Callable[[Column | str], Column] = (
            self.algo.Combine() if hasattr(self.algo, "Combine") else F.min
        )
        apply_expr = self.algo.Compute(None, g.vertices, ctx)
        return pregel(
            g,
            init=init,
            msg=message,
            agg=combine,
            apply=apply_expr,
            max_iter=max_iter,
            checkpoint_dir=checkpoint_dir,
            name=f"app_{self.name.lower()}",
        )


def _import_file(path: str) -> object:
    import hashlib

    abspath = os.path.abspath(path)
    mod_name = "gs_app_" + os.path.splitext(os.path.basename(path))[0]
    # unique per absolute path so two packages with the same module
    # name don't collide in sys.modules; md5 of the path (not hash(),
    # which is PYTHONHASHSEED-randomized) so import diagnostics are
    # stable across runs
    mod_name += "_" + hashlib.md5(abspath.encode()).hexdigest()[:8]
    spec = importlib.util.spec_from_file_location(mod_name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[mod_name] = mod
    # multi-file packages (the reference's .gar format allows modules
    # importing each other, framework/app.py) need their directory
    # importable while the module body runs
    pkg_dir = os.path.dirname(abspath)
    sys.path.insert(0, pkg_dir)
    try:
        spec.loader.exec_module(mod)
    finally:
        try:
            sys.path.remove(pkg_dir)
        except ValueError:
            pass
    return mod


def _candidate_files(path: str) -> list[str]:
    if os.path.isfile(path):
        if path.endswith((".gar", ".zip")):
            out_dir = tempfile.mkdtemp(prefix="gs_app_gar_")
            with zipfile.ZipFile(path) as z:
                z.extractall(out_dir)
            return _candidate_files(out_dir)
        return [path]
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".py") and not f.startswith("_")
        )
    raise FileNotFoundError(path)


def load_app(path: str, name: str | None = None) -> App:
    """Load a user-packaged algorithm and return a runnable :class:`App`.

    ``path``: a ``.py`` file, a directory of modules, or a
    ``.gar``/``.zip`` archive (the reference's packaging format).
    ``name``: select a specific decorated class when the package
    defines several.
    """
    found: list[App] = []
    for f in _candidate_files(path):
        mod = _import_file(f)
        for _, obj in inspect.getmembers(mod, inspect.isclass):
            kind = getattr(obj, "__decorated__", None)
            if kind in ("pie", "pregel") and obj.__module__ == mod.__name__:
                found.append(App(obj, kind, f))
    if name is not None:
        found = [a for a in found if a.name == name]
    if not found:
        raise ValueError(
            f"no @pie / @pregel_program class"
            f"{' named ' + name if name else ''} found under {path!r}"
        )
    if len(found) > 1:
        raise ValueError(
            "package defines multiple apps "
            f"{[a.name for a in found]}; pass name= to choose"
        )
    return found[0]
