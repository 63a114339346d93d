"""Model-based property test of the manifest DML surface.

Hypothesis generates arbitrary OPERATION SEQUENCES (append / MERGE /
copy-on-write DELETE / merge-on-read DELETE / keyed delete / UPDATE /
compact / RESTORE / write-audit-publish); a plain Python dict replays
the same sequence as the model. After every sequence the DV-applied
snapshot read must equal the model EXACTLY — one oracle for the
interactions no single-feature test enumerates (a restore landing on a
tombstoned version, an update over a merge-on-read delete, a compact
materializing vectors mid-history, a WAP publish after a restore...).

Example count is modest (each op is a real Spark commit), but hypothesis
shrinks any failure to a minimal op sequence — the highest-value
debugging artifact a transaction protocol can have.
"""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from cashback_data_pipeline_spark.sinks import manifest as M

KEYS = list(range(24))  # small key space → ops genuinely collide

_batch = st.lists(st.sampled_from(KEYS), min_size=1, max_size=6, unique=True)
_val = st.integers(min_value=0, max_value=9)

op_strategy = st.one_of(
    st.tuples(st.just("append_new"), _batch, _val),
    st.tuples(st.just("merge"), _batch, _val),
    st.tuples(st.just("merge_general"), _batch, _val),
    st.tuples(st.just("delete_cow"), _batch),
    st.tuples(st.just("delete_mor"), _batch),
    st.tuples(st.just("delete_keys"), _batch),
    st.tuples(st.just("update_add"), _batch, _val),
    st.tuples(st.just("compact"),),
    st.tuples(st.just("restore_back"),),
    st.tuples(st.just("wap"), _batch, _val, st.booleans()),
)


def _df(spark, pairs):
    return spark.createDataFrame([(k, v) for k, v in pairs], "k long, v long")


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.data_too_large],
)
@given(st.lists(op_strategy, min_size=1, max_size=5))
def test_any_dml_sequence_matches_the_dict_model(spark, ops):
    base = tempfile.mkdtemp(prefix="dml_model_")
    table = base + "/t"
    try:
        model: dict[int, int] = {k: 0 for k in KEYS[:8]}
        M.write_table(_df(spark, sorted(model.items())), table, stats_cols=["k"])
        history = [dict(model)]  # model snapshot per committed version

        def commit(new_model):
            history.append(dict(new_model))

        for op in ops:
            kind = op[0]
            v_before = M.current_version(table)
            if kind == "append_new":
                _, keys, val = op
                fresh = [(k, val) for k in keys if k not in model]
                n = M.append_table_if_absent(
                    spark, _df(spark, [(k, val) for k in keys]), table, key="k"
                )
                assert n == len(fresh)
                model.update(dict(fresh))
            elif kind == "merge":
                _, keys, val = op
                M.upsert_table(spark, _df(spark, [(k, val) for k in keys]), table, key="k")
                model.update({k: val for k in keys})
            elif kind == "merge_general":
                # general MERGE clauses (r9 item 3): first-match-wins —
                # delete on value collision, else additive update, and a
                # CONDITIONAL insert
                _, keys, val = op
                M.merge_table(
                    spark, _df(spark, [(k, val) for k in keys]), table, "k",
                    when_matched=[
                        ("delete", "s.v = t.v"),
                        ("update", None, {"v": "t.v + s.v"}),
                    ],
                    when_not_matched=[("insert", "s.v > 0", "*")],
                )
                for k in keys:
                    if k in model:
                        if model[k] == val:
                            model.pop(k)
                        else:
                            model[k] = model[k] + val
                    elif val > 0:
                        model[k] = val
            elif kind == "delete_cow":
                _, keys = op
                M.delete_where(spark, table, ("k", "in", keys))
                for k in keys:
                    model.pop(k, None)
            elif kind == "delete_mor":
                _, keys = op
                M.delete_where(spark, table, ("k", "in", keys), mode="merge_on_read")
                for k in keys:
                    model.pop(k, None)
            elif kind == "delete_keys":
                _, keys = op
                M.delete_keys(spark, _df(spark, [(k, 0) for k in keys]), table, key="k")
                for k in keys:
                    model.pop(k, None)
            elif kind == "update_add":
                _, keys, val = op
                M.update_where(spark, table, {"v": f"v + {val}"}, [("k", "in", keys)])
                model.update({k: model[k] + val for k in keys if k in model})
            elif kind == "compact":
                M.compact_table(spark, table, n_files=2)
            elif kind == "restore_back":
                target = max(1, M.current_version(table) - 1)
                M.restore_table(table, version=target)
                model = dict(history[target - 1])
            else:  # wap
                _, keys, val, publish = op
                tok = M.stage_commit(
                    _df(spark, [(k, val) for k in keys if k not in model]), table
                )
                if publish:
                    M.publish_staged(table, tok)
                    model.update({k: val for k in keys if k not in model})
                else:
                    M.discard_staged(table, tok)
            # some ops legitimately commit nothing (no matching files/rows);
            # record one model snapshot PER NEW VERSION so restore indexes
            # line up with the manifest log
            v_after = M.current_version(table)
            for _ in range(v_after - v_before):
                commit(model)
            got = {r.k: r.v for r in M.read_table(spark, table).collect()}
            assert got == model, (op, ops)
    finally:
        shutil.rmtree(base, ignore_errors=True)
