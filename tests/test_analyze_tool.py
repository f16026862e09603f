"""Shadow-catalog analysis sweep (tools/analyze_reference.py) on a
synthetic mini-warehouse: a raw layer that exists nowhere (repair
path), a CTAS layer that depends on it out of file order (fixed-point
path), an INSERT into the CTAS output, and a genuinely broken
statement that must stay red. Runs the tool as a subprocess exactly
like the sweep does."""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_FILES = {
    # sorts AFTER the mart file -- forces a convergence round
    "z_ods/10_conform.sql": """
DROP TABLE IF EXISTS ods_x.orders_conformed;
CREATE TABLE ods_x.orders_conformed AS
SELECT order_id::INT AS order_id,
       amount::DOUBLE PRECISION AS amount,
       TO_CHAR(created_at, 'YYYY-MM-DD') AS created_day
FROM stg_raw.orders_landing
WHERE status ~ '^[A-Z]+$';
""",
    "a_mart/20_mart.sql": """
DROP TABLE IF EXISTS mart_x.daily_rev;
CREATE TABLE mart_x.daily_rev AS
SELECT created_day, SUM(amount) AS rev
FROM ods_x.orders_conformed
GROUP BY 1;

INSERT INTO mart_x.daily_rev
SELECT created_day, SUM(amount) AS rev
FROM ods_x.orders_conformed
GROUP BY 1;
""",
    "b_broken/30_bad.sql": """
CREATE TABLE mart_x.broken AS
SELECT missing_fn_xyz(1, 2, 3) AS v
FROM ods_x.orders_conformed;
""",
    # a SOURCE-INVALID creator (array_agg ORDER BY DESC has no
    # mechanical rewrite -> TranspileError) whose INSERT column list
    # still declares the schema lexically -- the r8 hint-synthesis
    # path: the consumer below must analyze against the synthesized
    # table
    "c_dead/40_dead_creator.sql": """
INSERT INTO stg_dead.landing_q (qid, qval, qday)
SELECT array_agg(x ORDER BY y DESC), 1, 2 FROM somewhere;

DROP TABLE IF EXISTS mart_x.from_dead;
CREATE TABLE mart_x.from_dead AS
SELECT qid, qday FROM stg_dead.landing_q;
""",
    # a consumer of the ANALYZER-failed creator above (mart_x.broken
    # never materializes): phase 3 must lift the pending-creator
    # guard and synthesize it from consumer inference
    "d_downstream/50_downstream.sql": """
DROP TABLE IF EXISTS mart_x.downstream;
CREATE TABLE mart_x.downstream AS
SELECT b.v FROM mart_x.broken b;
""",
    # the r9 ambiguity-retraction path: 60_a makes a BARE-column
    # guess (sku lands on stg_amb.products), 61_b later proves sku's
    # real home via a QUALIFIED reference (stg_amb.variants), so
    # 62_c's bare sku over a join of both is AMBIGUOUS_REFERENCE --
    # the repair must retract the bare guess from products and let
    # sku resolve to variants
    "e_ambig/60_a.sql": """
DROP TABLE IF EXISTS mart_x.amb_a;
CREATE TABLE mart_x.amb_a AS
SELECT p.pid, sku FROM stg_amb.products p;
""",
    "e_ambig/61_b.sql": """
DROP TABLE IF EXISTS mart_x.amb_b;
CREATE TABLE mart_x.amb_b AS
SELECT v.sku, v.vid FROM stg_amb.variants v;
""",
    "e_ambig/62_c.sql": """
DROP TABLE IF EXISTS mart_x.amb_c;
CREATE TABLE mart_x.amb_c AS
SELECT sku
FROM stg_amb.products p
JOIN stg_amb.variants v ON v.vid = p.pid;
""",
    # the r9 schema-from-SELECT retype path: 70 synthesizes
    # stg_w.landing with one consumer-inferred column; 71's INSERT
    # (no column list) carries three — the arity repair rebuilds the
    # table to the SELECT's aliases; 72 then reads the new columns
    "f_retype/70_consumer.sql": """
CREATE TABLE mart_x.uses_w AS
SELECT w.wid FROM stg_w.landing w;
""",
    "f_retype/71_insert.sql": """
INSERT INTO stg_w.landing
SELECT '1' AS wid, '2' AS wval, '3' AS wday
FROM ods_x.orders_conformed;
""",
    # the reader references only wid — no consumer ever names wval/
    # wday, so the INSERT's arity mismatch is the ONLY schema signal
    # (matching the real corpus's 317 arity statements)
    "f_retype/72_reader.sql": """
CREATE TABLE mart_x.w_report AS
SELECT wid FROM stg_w.landing;
""",
    # the r10 pad-not-shrink path (VERDICT r9 #1): 80 infers
    # {pid, legacy_col} onto stg_p.landing; 81's no-column-list
    # INSERT supplies {pid, pval, pday} — legacy_col is NOT in the
    # INSERT schema, so a schema-from-SELECT rebuild would discard a
    # column a consumer reads (the r9 UNRESOLVED_COLUMN 173→944
    # regression). The repair must PAD (add pval/pday) and leave the
    # INSERT to the graded arity tier; 82 then reads BOTH a padded
    # column and the consumer-inferred survivor
    "g_pad/80_consumer.sql": """
CREATE TABLE mart_x.uses_p AS
SELECT p.pid, p.legacy_col FROM stg_p.landing p;
""",
    # four columns so the width cannot coincide with the three
    # consumer-inferred ones ({legacy_col, pid} from 80 + bare pval
    # from 82) — a 3-wide INSERT would slot in positionally and mask
    # the repair path entirely
    "g_pad/81_insert.sql": """
INSERT INTO stg_p.landing
SELECT '1' AS pid, '2' AS pval, '3' AS pday, '4' AS pwk
FROM ods_x.orders_conformed;
""",
    "g_pad/82_reader.sql": """
CREATE TABLE mart_x.p_report AS
SELECT pval, legacy_col FROM stg_p.landing;
""",
    # the r11 typed-shim tier (VERDICT r10 #6): consumer inference
    # types every synthesized column STRING. Under the sweep's
    # non-ANSI session the string arithmetic (committed + extra)
    # implicit-casts like Redshift would, but a STRING in boolean
    # position (WHERE is_active) still trips FILTER_NOT_BOOLEAN —
    # the repair must retype exactly that column to BOOLEAN and the
    # statement then analyzes clean
    # the r12 USING-localization path (r11 ADVICE #3): the USING
    # join's right operand is stg_u.b_t, but stg_u.c_t is textually
    # LAST — the old first/last-in-text heuristic would bolt uid
    # onto c_t (unrelated to the USING join) and strand the
    # statement; the localized repair resolves the join's actual
    # sides and rotates candidates with retraction
    "i_using/95_using.sql": """
DROP TABLE IF EXISTS mart_x.using_join;
CREATE TABLE mart_x.using_join AS
SELECT a.aid
FROM stg_u.a_t a
JOIN stg_u.b_t USING (uid)
LEFT JOIN stg_u.c_t c ON c.cid = a.aid;
""",
    "h_dtype/90_metrics.sql": """
DROP TABLE IF EXISTS mart_x.rev_calc;
CREATE TABLE mart_x.rev_calc AS
SELECT q.committed_value + q.extra_value AS total_value,
       q.started_at
FROM stg_t.metrics q
WHERE q.is_active;
""",
}


def test_shadow_analysis_smoke(tmp_path):
    ref = tmp_path / "ref"
    for rel, text in _FILES.items():
        p = ref / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(text)
    out = tmp_path / "cov.json"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/analyze_reference.py"),
         str(ref), str(out)],
        check=True, cwd=REPO, capture_output=True, timeout=300,
    )
    cov = json.loads(out.read_text())
    # 11 statements total: the original 6 (2 DROP + 2 CTAS + 1
    # INSERT ok; unknown function stays red) plus 1 transpile-failed
    # dead creator, its DROP+CTAS consumer (hint-synthesized table),
    # and the DROP+CTAS consumer of the analyzer-failed creator
    # (phase-3 guard lift). Repaired: stg_raw.orders_landing,
    # stg_dead.landing_q, mart_x.broken.
    assert cov["statements"] == 27
    assert cov["transpile_failed"] == 1
    assert cov["analyzed_ok"] == 24
    assert cov["repaired_tables"] == 11
    # r12 USING localization: the i_using statement analyzing OK is
    # itself the proof — the old heuristic bolted uid onto the
    # textually-last c_t and left b_t (the join's actual right side)
    # without it, so the CTAS stayed red (analyzed_ok would read 23)
    for t in ("stg_u.a_t", "stg_u.b_t", "stg_u.c_t"):
        assert t in cov["synthesized_tables"], t
    # r11 typed-shim: is_active retyped BOOLEAN on the SYNTHESIZED
    # stg_t.metrics (the string arithmetic needs no retype under the
    # non-ANSI sweep session — Redshift-like implicit casts)
    assert cov["datatype_retypes"] == 1
    # the bare guess on stg_amb.products was retracted when the
    # qualified home (stg_amb.variants) made 62_c ambiguous
    assert cov["ambiguity_drops"] >= 1
    # 71's arity mismatch rebuilt stg_w.landing to the SELECT schema
    assert cov["insert_select_schema_rebuilds"] >= 1
    assert cov["synthesized_tables"]["stg_w.landing"]["via"] == (
        "insert-select-schema"
    )
    assert cov["synthesized_tables"]["stg_w.landing"]["n_cols"] == 3
    assert any(
        "UNRESOLVED_ROUTINE" in k for k in cov["residual_buckets"]
    ), cov["residual_buckets"]
    # r10 pad-not-shrink: stg_p.landing kept legacy_col (consumer-
    # inferred, absent from the INSERT schema), gained the INSERT
    # aliases as a PAD, and the INSERT itself landed in the graded
    # arity tier instead of analyzed-ok
    assert cov["synthesized_tables"]["stg_p.landing"]["via"] == (
        "consumer-inference"
    )
    assert cov["synthesized_tables"]["stg_p.landing"]["via_pad"] == (
        "insert-select-pad"
    )
    assert cov["insert_arity_on_synthesized_schema"] >= 1
    synth = cov["synthesized_tables"]
    assert synth["stg_dead.landing_q"]["via"] == "insert-column-list"
    assert synth["stg_dead.landing_q"]["n_cols"] >= 3
    assert "40_dead_creator.sql" in synth["stg_dead.landing_q"]["source_file"]
    assert synth["mart_x.broken"]["via"] == "consumer-inference"
    assert cov["schema_hints_lifted"] == 1
