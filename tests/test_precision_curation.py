"""precision_curation flagship: stage-by-stage count pins derived by
hand from the fixture construction (__spark_entry__._precision_fixture)
— 35 images = 10 groups × (base, ±1 near-dup, ±80 lookalike) + 4
low-information + 1 corrupt; boilerplate caption on id ≡ 3 (mod 7);
eval set = phashes of ids 0 and 3. The value-exact cross-check vs the
independent-math DuckDB oracle is the precision_curation contract row;
these pins make the expected shape human-auditable."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _result(spark):
    import __spark_entry__ as e

    rows = e.q_precision_curation(spark, "").collect()
    return {r["image_id"]: r for r in rows}


def test_flagship_shape(spark):
    got = _result(spark)

    # 35 - 5 low-info/corrupt - 4 boilerplate - 3 decontaminated = 23
    assert len(got) == 23

    # low-information and corrupt images never survive
    for i in (30, 31, 32, 33, 34):
        assert i not in got
    # boilerplate-caption ids (3, 10, 17, 24, 31): 31 already low-info
    for i in (3, 10, 17, 24):
        assert i not in got
    # decontaminated: group 0 base+tiny (eval hash = id 0), group 1
    # tiny (eval hash = id 3; the base id 3 fell to the caption cut)
    for i in (0, 1, 4):
        assert i not in got

    # verified near-dup clusters: base+tiny pairs where BOTH survive —
    # groups 2,4,5,6,7,9 (g3 lost its tiny id 10, g8 its base id 24,
    # g0/g1 decontaminated). The ±80 lookalikes never verify (PSNR≈12).
    two_clusters = {
        g: (3 * g, 3 * g + 1) for g in (2, 4, 5, 6, 7, 9)
    }
    for g, (a, b) in two_clusters.items():
        assert got[a]["cluster"] == got[b]["cluster"] == a
        assert got[a]["cluster_size"] == 2
        assert got[a]["is_canonical"] is True
        assert got[b]["is_canonical"] is False

    singles = [i for i, r in got.items() if r["cluster_size"] == 1]
    assert len(singles) == 11
    for i in singles:
        assert got[i]["cluster"] == i
        assert got[i]["is_canonical"] is True

    # exactly one canonical representative per cluster
    assert sum(1 for r in got.values() if r["is_canonical"]) == 6 + 11
