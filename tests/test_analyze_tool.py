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
    # 6 statements total: 2 DROP + 2 CTAS + 1 INSERT analyze OK (the
    # raw landing table is repair-created with the referenced
    # columns); the unknown function stays red.
    assert cov["statements"] == 6
    assert cov["analyzed_ok"] == 5
    assert cov["repaired_tables"] == 1
    assert any(
        "UNRESOLVED_ROUTINE" in k for k in cov["residual_buckets"]
    ), cov["residual_buckets"]
