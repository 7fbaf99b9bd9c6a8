"""load_app packaging shim (graphscope_spark/app.py) — the analog of
the reference's ``load_app(gar=...)`` / ``AppAssets``
(python/graphscope/framework/app.py:149-326): import a user-packaged
algorithm (PIE or Pregel contract) from a path and run it.

The loaded SSSP must match algorithms.sssp exactly on the same graph.
"""

from __future__ import annotations

import textwrap
import zipfile

import pytest

from graphscope_spark.app import load_app
from graphscope_spark.algorithms import sssp

PIE_SSSP_SRC = textwrap.dedent(
    '''
    from pyspark.sql import functions as F

    from graphscope_spark.pie import pie


    @pie(vd_type="double", md_type="double")
    class SSSP_PIE:
        @staticmethod
        def Init(frag, context):
            src = context.get_config("src")
            context.init_value(
                F.when(F.col("vid") == src, 0.0).otherwise(float("inf")),
                aggregate="min",
            )

        @staticmethod
        def PEval(frag, context):
            src = context.get_config("src")
            e = frag.weighted_edges()
            return e.where(e["src"] == src).select(
                F.col("dst").alias("vid"), F.col("w").alias("msg")
            )

        @staticmethod
        def IncEval(frag, context):
            e = frag.weighted_edges()
            st = context.values
            return e.join(st, e["src"] == st["vid"]).select(
                e["dst"].alias("vid"), (st["value"] + e["w"]).alias("msg")
            )
    '''
)

PREGEL_SSSP_SRC = textwrap.dedent(
    '''
    from pyspark.sql import functions as F

    from graphscope_spark.app import pregel_program


    @pregel_program(vd_type="double", md_type="double")
    class SSSP_Pregel:
        @staticmethod
        def Init(v, context):
            src = context.get_config("src")
            return F.when(F.col("vid") == src, 0.0).otherwise(float("inf"))

        @staticmethod
        def Message(edge, context):
            return F.col("value") + F.col("weight")

        @staticmethod
        def Combine():
            return F.min

        @staticmethod
        def Compute(messages, v, context):
            return F.least(F.col("value"), F.col("msg"))
    '''
)


def _expected(tiny_graph, source):
    return {
        r["vid"]: r["dist"]
        for r in sssp(tiny_graph, source=source, weight=None).collect()
    }


def test_load_pie_app_from_package_dir(spark, tiny_graph, tmp_path):
    pkg = tmp_path / "sssp_pkg"
    pkg.mkdir()
    (pkg / "sssp_pie.py").write_text(PIE_SSSP_SRC)
    app = load_app(str(pkg))
    assert app.kind == "pie" and app.name == "SSSP_PIE"
    got = {
        r["vid"]: r["value"]
        for r in app(tiny_graph, config={"src": 1}).collect()
    }
    assert got == _expected(tiny_graph, 1)


def test_load_pregel_app_from_gar_archive(spark, tiny_graph, tmp_path):
    gar = tmp_path / "sssp.gar"
    with zipfile.ZipFile(gar, "w") as z:
        z.writestr("sssp_pregel.py", PREGEL_SSSP_SRC)
    app = load_app(str(gar))
    assert app.kind == "pregel" and app.name == "SSSP_Pregel"
    got = {
        r["vid"]: r["value"]
        for r in app(tiny_graph, config={"src": 1}).collect()
    }
    assert got == _expected(tiny_graph, 1)


def test_load_app_selects_by_name_and_rejects_ambiguity(spark, tmp_path):
    pkg = tmp_path / "multi_pkg"
    pkg.mkdir()
    (pkg / "a.py").write_text(PIE_SSSP_SRC)
    (pkg / "b.py").write_text(PREGEL_SSSP_SRC)
    with pytest.raises(ValueError, match="multiple apps"):
        load_app(str(pkg))
    app = load_app(str(pkg), name="SSSP_Pregel")
    assert app.kind == "pregel"
    with pytest.raises(ValueError, match="no @pie"):
        load_app(str(pkg), name="NotThere")


def test_pregel_rejects_instance_methods_at_decoration():
    """ADVICE r4: mirror the reference's decoration-time check
    (udf/decorators.py _check_and_reorder) — a program written with
    instance methods must fail loudly at @pregel_program time, not
    with an opaque TypeError at run time."""
    from graphscope_spark.app import pregel_program

    with pytest.raises(ValueError, match="staticmethod decorator on method Init"):

        @pregel_program()
        class BadSSSP:
            def Init(self, v, context):  # missing @staticmethod
                return None

            @staticmethod
            def Compute(messages, v, context):
                return None


def test_load_app_multifile_package_cross_import(spark, tiny_graph, tmp_path):
    """A .gar-style package whose modules import each other (supported
    by the reference's gar format) must load — the package dir goes on
    sys.path while the module body executes (ADVICE r4)."""
    pkg = tmp_path / "sssp_multi"
    pkg.mkdir()
    (pkg / "helpers.py").write_text(
        "from pyspark.sql import functions as F\n"
        "def init_expr(src):\n"
        "    return F.when(F.col('vid') == src, 0.0).otherwise(float('inf'))\n"
    )
    (pkg / "sssp_main.py").write_text(
        textwrap.dedent(
            '''
            from pyspark.sql import functions as F
            import helpers
            from graphscope_spark.app import pregel_program

            @pregel_program(vd_type="double", md_type="double")
            class SSSP_Multi:
                @staticmethod
                def Init(v, context):
                    return helpers.init_expr(context.get_config("src"))

                @staticmethod
                def Message(edge, context):
                    return F.col("value") + F.col("weight")

                @staticmethod
                def Combine():
                    return F.min

                @staticmethod
                def Compute(messages, v, context):
                    return F.least(F.col("value"), F.col("msg"))
            '''
        )
    )
    app = load_app(str(pkg))
    assert app.name == "SSSP_Multi"
    got = {
        r["vid"]: r["value"] for r in app(tiny_graph, config={"src": 1}).collect()
    }
    assert got == _expected(tiny_graph, 1)


def test_import_module_name_is_stable(tmp_path):
    """hash()-free module suffix: two imports of the same path resolve
    to the same module name across processes (md5 of abspath)."""
    from graphscope_spark.app import _import_file

    p = tmp_path / "algo_mod.py"
    p.write_text("X = 41\n")
    m1 = _import_file(str(p))
    m2 = _import_file(str(p))
    assert m1.__name__ == m2.__name__
    import hashlib, os
    want = "gs_app_algo_mod_" + hashlib.md5(
        os.path.abspath(str(p)).encode()
    ).hexdigest()[:8]
    assert m1.__name__ == want
