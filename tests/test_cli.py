"""Operational CLI: init/track/fetch/maintain lifecycle through
``python -m kadiyadb_spark`` (in-process main(argv), shared session)."""

import json

from pyspark.sql import Row

from kadiyadb_spark.__main__ import main


def _out(capsys):
    return [json.loads(line) for line in capsys.readouterr().out.strip().splitlines()]


def test_cli_lifecycle(spark, tmp_path, capsys):
    db = str(tmp_path / "db")
    ev = str(tmp_path / "ev.parquet")
    spark.createDataFrame(
        [Row(ts=0, x="a", y="b", value=5.0), Row(ts=1, x="a", y="b", value=2.0)]
    ).write.parquet(ev)

    assert main(["init", "--path", db, "--duration", "5", "--resolution", "1",
                 "--retention", "10", "--fields", "x,y"]) == 0
    (init_out,) = _out(capsys)
    assert init_out["params"]["fields"] == ["x", "y"]

    assert main(["track", "--path", db, "--events", ev, "--total-col", "value"]) == 0
    (track_out,) = _out(capsys)
    assert track_out["gen"] == 0

    assert main(["fetch", "--path", db, "--from-ns", "0", "--to-ns", "2",
                 "--pattern", "a,b"]) == 0
    rows = {r["bucket"]: (r["total"], r["cnt"]) for r in _out(capsys)}
    assert rows == {0: (5.0, 1.0), 1: (2.0, 1.0)}

    assert main(["info", "--path", db]) == 0
    (info_out,) = _out(capsys)
    assert info_out["current_gen"] == 0

    assert main(["fsck", "--path", db]) == 0
    (fsck_out,) = _out(capsys)
    assert fsck_out["missing"] == [] and fsck_out["orphans"] == []

    assert main(["maintain", "--path", db, "--now-ns", "100"]) == 0
    _out(capsys)  # shape-checked by the library's own tests


def test_cli_rollup_refresh(spark, tmp_path, capsys):
    src, dst = str(tmp_path / "s"), str(tmp_path / "d")
    ev = str(tmp_path / "e.parquet")
    spark.createDataFrame([Row(ts=0, x="a", y="b", value=1.0)]).write.parquet(ev)
    main(["init", "--path", src, "--duration", "5", "--resolution", "1",
          "--retention", "10", "--fields", "x,y"])
    main(["init", "--path", dst, "--duration", "10", "--resolution", "5",
          "--retention", "100", "--fields", "x,y"])
    main(["track", "--path", src, "--events", ev, "--total-col", "value"])
    capsys.readouterr()
    assert main(["rollup", "--src", src, "--dst", dst]) == 0
    (r1,) = _out(capsys)
    assert r1["applied"] is True
    assert main(["rollup", "--src", src, "--dst", dst]) == 0
    (r2,) = _out(capsys)
    assert r2["applied"] is False  # idempotent


def test_cli_route_across_tiers(spark, tmp_path, capsys):
    """`route` fetches across every database under a server root through
    the resolution router; res_ns stamps which tier answered."""
    root = tmp_path / "srv"
    root.mkdir()
    fine, coarse = str(root / "fine"), str(root / "coarse")
    ev = str(tmp_path / "e.parquet")
    spark.createDataFrame(
        [Row(ts=i, x="a", y="b", value=1.0) for i in range(0, 10)]
    ).write.parquet(ev)
    main(["init", "--path", fine, "--duration", "5", "--resolution", "1",
          "--retention", "100", "--fields", "x,y"])
    main(["init", "--path", coarse, "--duration", "10", "--resolution", "5",
          "--retention", "1000", "--fields", "x,y"])
    main(["track", "--path", fine, "--events", ev, "--total-col", "value"])
    assert main(["rollup", "--src", fine, "--dst", coarse]) == 0
    capsys.readouterr()
    # 10 ns at 1-ns resolution = 10 points: budget 3 -> the 5-ns tier (2)
    assert main(["route", "--root", str(root), "--from-ns", "0", "--to-ns", "10",
                 "--pattern", "a,*", "--max-points", "3", "--sparse"]) == 0
    rows = _out(capsys)
    assert rows and all(r["res_ns"] == 5 for r in rows)
    assert sum(r["total"] for r in rows) == 10.0
    # generous budget -> fine tier
    assert main(["route", "--root", str(root), "--from-ns", "0", "--to-ns", "10",
                 "--pattern", "a,*", "--max-points", "1000", "--sparse"]) == 0
    rows = _out(capsys)
    assert rows and all(r["res_ns"] == 1 for r in rows)


def test_cli_funnel_and_cohort(spark, tmp_path, capsys):
    """`funnel` and `cohort` run the analytics operators over a parquet
    events path, JSONL to stdout."""
    ev = str(tmp_path / "ev.parquet")
    spark.createDataFrame(
        [
            Row(ts=1, user_id=1, event_type="signup"),
            Row(ts=2, user_id=1, event_type="view"),
            Row(ts=3, user_id=2, event_type="signup"),
        ]
    ).write.parquet(ev)
    assert main(["funnel", "--events", ev, "--steps", "signup,view"]) == 0
    rows = _out(capsys)
    assert [(r["stage"], r["users"]) for r in rows] == [(1, 2), (2, 1)]
    # within=0 is rejected by the operator's validation
    import pytest as _pt

    with _pt.raises(ValueError, match="window"):
        main(["funnel", "--events", ev, "--steps", "signup,view",
              "--within-ns", "0"])

    assert main(["cohort", "--events", ev, "--day-ns", "2"]) == 0
    rows = _out(capsys)
    # user 1 active in days 0 (ts1) and 1 (ts2); user 2 in day 1 only
    got = {(r["cohort_day"], r["day_offset"]): r["active_users"] for r in rows}
    assert got == {(0, 0): 1, (0, 1): 1, (1, 0): 1}


def test_cli_alerts_and_paths(spark, tmp_path, capsys):
    db = str(tmp_path / "adb")
    ev = str(tmp_path / "aev.parquet")
    spark.createDataFrame(
        [Row(ts=t, x="a", value=v, user_id=u, event_id=i, event_type=e)
         for i, (t, v, u, e) in enumerate([
             (0, 9.0, 1, "view"), (1, 9.0, 1, "click"),
             (2, 1.0, 2, "view"), (3, 9.0, 2, "click"),
         ])]
    ).write.parquet(ev)

    assert main(["init", "--path", db, "--duration", "5", "--resolution", "1",
                 "--retention", "10", "--fields", "x"]) == 0
    capsys.readouterr()
    assert main(["track", "--path", db, "--events", ev, "--total-col", "value"]) == 0
    capsys.readouterr()

    # threshold 5 held 2+ consecutive slots: slots 0-1 fire; slot 3 alone doesn't
    assert main(["alerts", "--path", db, "--from-ns", "0", "--to-ns", "4",
                 "--pattern", "a", "--threshold", "5.0", "--for-slots", "2"]) == 0
    runs = _out(capsys)
    assert len(runs) == 1
    assert (runs[0]["pending_start"], runs[0]["run_end"], runs[0]["n_slots"]) == (0, 2, 2)

    assert main(["paths", "--events", ev]) == 0
    hops = {(r["from_event"], r["to_event"]): (r["transitions"], r["users"]) for r in _out(capsys)}
    assert hops == {("view", "click"): (2, 2)}


def test_cli_clone(spark, tmp_path, capsys):
    db = str(tmp_path / "cdb")
    dst = str(tmp_path / "cdb_backup")
    ev = str(tmp_path / "cev.parquet")
    spark.createDataFrame([Row(ts=0, x="a", value=5.0)]).write.parquet(ev)
    assert main(["init", "--path", db, "--duration", "5", "--resolution", "1",
                 "--retention", "10", "--fields", "x"]) == 0
    capsys.readouterr()
    assert main(["track", "--path", db, "--events", ev, "--total-col", "value"]) == 0
    capsys.readouterr()
    assert main(["clone", "--path", db, "--dst", dst]) == 0
    (out,) = _out(capsys)
    assert out["cloned"] == dst and out["gen"] == 0
    assert main(["fetch", "--path", dst, "--from-ns", "0", "--to-ns", "1",
                 "--pattern", "a"]) == 0
    rows = _out(capsys)
    assert rows and rows[0]["total"] == 5.0


def test_cli_rfm_keywords_bm25(spark, tmp_path, capsys):
    """The three late-r08 commands: rfm over events, keywords/bm25 over a
    document corpus — JSONL to stdout, deterministic ordering."""
    ev = str(tmp_path / "ev.parquet")
    D = 86400 * 10**9
    spark.createDataFrame(
        [
            Row(ts=9 * D, user_id=1, value=100.0),
            Row(ts=9 * D + 1, user_id=1, value=50.0),
            Row(ts=1 * D, user_id=2, value=1.0),
        ]
    ).write.parquet(ev)
    assert main(["rfm", "--events", ev, "--now-ns", str(10 * D),
                 "--bins", "2"]) == 0
    rows = _out(capsys)
    assert [(r["user_id"], r["segment"]) for r in rows] == [(1, 222), (2, 111)]

    docs = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [
            Row(doc_id=0, text="rare rare shared"),
            Row(doc_id=1, text="shared other"),
        ]
    ).write.parquet(docs)
    assert main(["keywords", "--docs", docs, "--top", "1"]) == 0
    rows = _out(capsys)
    assert [r["term"] for r in rows] == ["rare", "other"]

    assert main(["bm25", "--docs", docs, "--query", "rare shared", "--k", "1"]) == 0
    rows = _out(capsys)
    assert len(rows) == 1 and rows[0]["doc_id"] == 0 and rows[0]["rank"] == 1


def test_cli_drift_containment_knn(spark, tmp_path, capsys):
    """The tail-r08 commands: drift between two snapshots, containment over
    a corpus, knn over embeddings."""
    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    spark.createDataFrame([(1.0,), (5.0,)], "x double").write.parquet(a)
    spark.createDataFrame([(9.0,), (9.0,)], "x double").write.parquet(b)
    assert main(["drift", "--a", a, "--b", b, "--col", "x",
                 "--bounds", "2.0,6.0"]) == 0
    rows = _out(capsys)
    assert len(rows) == 3 and all("psi_total" in r for r in rows)

    docs = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [Row(doc_id=0, text="alpha beta gamma delta"),
         Row(doc_id=1, text="alpha beta gamma delta epsilon zeta")],
    ).write.parquet(docs)
    assert main(["containment", "--docs", docs, "--max-df", "5",
                 "--threshold", "0.9"]) == 0
    rows = _out(capsys)
    assert rows and rows[0]["cont_a"] == 1.0

    emb = str(tmp_path / "emb.parquet")
    spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i % 3), 1.0]) for i in range(6)]
    ).write.parquet(emb)
    assert main(["knn", "--emb", emb, "--k", "2", "--centroids", "1"]) == 0
    rows = _out(capsys)
    assert len(rows) == 12 and all(r["rank"] in (1, 2) for r in rows)


def test_cli_entropy_and_wsample(spark, tmp_path, capsys):
    """The r09 commands: char-entropy quality signal and weighted sampling
    without replacement — JSONL to stdout, deterministic."""
    docs = str(tmp_path / "edocs.parquet")
    spark.createDataFrame(
        [
            Row(doc_id=0, text="abab", n=10.0),
            Row(doc_id=1, text="zzzz", n=1.0),
            Row(doc_id=2, text="aab", n=5.0),
        ]
    ).write.parquet(docs)
    assert main(["entropy", "--docs", docs]) == 0
    rows = _out(capsys)
    assert [(r["doc_id"], r["char_entropy"]) for r in rows] == [
        (0, 1.0), (1, 0.0), (2, 0.9183)
    ]

    assert main(["wsample", "--docs", docs, "--k", "2", "--weight-col", "n"]) == 0
    rows = _out(capsys)
    # replay the Efraimidis-Spirakis keys in pure python
    import hashlib
    import math

    def key(i, w):
        h = int(hashlib.md5(f"ws{i}".encode()).hexdigest()[:13], 16)
        return -math.log((h + 0.5) / float(1 << 52)) / w

    exp = sorted(sorted([(0, 10.0), (1, 1.0), (2, 5.0)], key=lambda t: key(*t))[:2])
    assert [(r["doc_id"], r["n"]) for r in rows] == exp


def test_cli_kmv(spark, tmp_path, capsys):
    """KMV set-op command: pairwise distinct/union/intersect estimates;
    sub-k groups are exact, so the tiny fixture's numbers are exact
    distinct counts."""
    ev = str(tmp_path / "kmv_ev.parquet")
    rows = [Row(event_type="a", user_id=i) for i in range(8)] + [
        Row(event_type="b", user_id=i + 4) for i in range(8)
    ]
    spark.createDataFrame(rows * 2).write.parquet(ev)  # duplicates collapse
    assert main(["kmv", "--events", ev, "--k", "64"]) == 0
    out = _out(capsys)
    assert len(out) == 1
    r = out[0]
    assert (r["group_a"], r["group_b"]) == ("a", "b")
    # both groups < k: the sketches are the full hash sets -> exact
    assert r["est_a"] == 8.0 and r["est_b"] == 8.0
    assert r["est_union"] == 12.0 and r["est_intersect"] == 4.0
    assert r["est_jaccard"] == 0.3333  # round4(1/3)


def test_cli_quantiles(spark, tmp_path, capsys):
    """Exact-quantile command: 5 values per group -> dyadic ranks land on
    exact order statistics and midpoints."""
    t = str(tmp_path / "q.parquet")
    rows = [Row(g="a", v=float(i)) for i in (1, 2, 3, 4, 5)] + [
        Row(g="b", v=2.5)
    ]
    spark.createDataFrame(rows).write.parquet(t)
    assert main(["quantiles", "--table", t, "--value-col", "v",
                 "--group-col", "g"]) == 0
    out = {r["g"]: r for r in _out(capsys)}
    assert (out["a"]["p25"], out["a"]["p50"], out["a"]["p75"]) == (2.0, 3.0, 4.0)
    assert out["a"]["n"] == 5
    assert (out["b"]["p25"], out["b"]["p50"], out["b"]["p75"]) == (2.5, 2.5, 2.5)


def test_cli_absent(spark, tmp_path, capsys):
    """absent command: points at slots 0 and 3 over [0, 5) -> absent
    slots 1, 2, 4; a never-tracked pattern is absent everywhere."""
    db = str(tmp_path / "dba")
    ev = str(tmp_path / "eva.parquet")
    spark.createDataFrame(
        [Row(ts=0, x="a", y="b", value=1.0), Row(ts=3, x="a", y="b", value=1.0)]
    ).write.parquet(ev)
    assert main(["init", "--path", db, "--duration", "5", "--resolution", "1",
                 "--retention", "10", "--fields", "x,y"]) == 0
    _out(capsys)
    assert main(["track", "--path", db, "--events", ev, "--total-col", "value"]) == 0
    _out(capsys)
    assert main(["absent", "--path", db, "--from-ns", "0", "--to-ns", "5",
                 "--pattern", "a,b"]) == 0
    assert [r["bucket"] for r in _out(capsys)] == [1, 2, 4]
    assert main(["absent", "--path", db, "--from-ns", "0", "--to-ns", "5",
                 "--pattern", "zzz,*"]) == 0
    assert [r["bucket"] for r in _out(capsys)] == [0, 1, 2, 3, 4]


def test_cli_cmsketch(spark, tmp_path, capsys):
    """Count-Min command: in the sparse regime (distinct keys << width)
    estimates equal exact counts; the hottest key leads the probe set."""
    ev = str(tmp_path / "cm_ev.parquet")
    rows = [Row(event_type="a", user_id=7)] * 5 + [
        Row(event_type="a", user_id=9)
    ] * 2 + [Row(event_type="b", user_id=7)] * 3
    spark.createDataFrame(rows).write.parquet(ev)
    assert main(["cmsketch", "--events", ev, "--width", "32", "--topn", "2"]) == 0
    out = _out(capsys)
    got = {(r["event_type"], r["user_id"]): r["est_cnt"] for r in out}
    assert got[("a", 7)] == 5 and got[("a", 9)] == 2 and got[("b", 7)] == 3
    # user 9 never hit type b: min over rows is 0 in the sparse regime
    assert got[("b", 9)] == 0


def test_cli_pagerank(spark, tmp_path, capsys):
    """pagerank command: hub-and-spoke graph — the hub every node links
    to outranks the spokes; ranks are the documented scaled longs."""
    e = str(tmp_path / "edges.parquet")
    spark.createDataFrame(
        [Row(src=s, dst="hub") for s in ("a", "b", "c")]
        + [Row(src="hub", dst="a")]
    ).write.parquet(e)
    assert main(["pagerank", "--edges", e, "--iters", "3"]) == 0
    out = _out(capsys)
    assert out[0]["node"] == "hub"  # sorted rank desc
    ranks = {r["node"]: r["rank"] for r in out}
    assert ranks["hub"] > ranks["a"] > ranks["b"] == ranks["c"] == 150000


def test_cli_urlcanon_kanon_asof(spark, tmp_path, capsys):
    docs = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [
            Row(doc_id=0, url="HTTPS://A.B.com/x?utm_source=q&k=1"),
            Row(doc_id=1, url="https://a.b.com/x/?k=1"),
            Row(doc_id=2, url="https://a.b.com/y"),
        ]
    ).write.parquet(docs)
    assert main(["urlcanon", "--table", docs]) == 0
    (row,) = _out(capsys)
    assert row["canonical_url"] == "https://a.b.com/x?k=1"
    assert row["n_docs"] == 2 and row["keep_doc_id"] == 0

    tbl = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [Row(id=i, nat="A" if i < 4 else "B", seg="x") for i in range(5)]
    ).write.parquet(tbl)
    assert main(["kanon", "--table", tbl, "--quasi-cols", "nat,seg", "--k", "3"]) == 0
    rows = {r["nat"]: r for r in _out(capsys)}
    assert rows["A"]["suppressed"] == 0 and rows["B"]["suppressed"] == 1

    lt, rt = str(tmp_path / "l.parquet"), str(tmp_path / "r.parquet")
    spark.createDataFrame([Row(u=1, ts=100, oid=7)]).write.parquet(lt)
    spark.createDataFrame([Row(u=1, ts=90, px=1.5)]).write.parquet(rt)
    assert main(["asof", "--left", lt, "--right", rt, "--by-cols", "u",
                 "--right-cols", "px"]) == 0
    (row,) = _out(capsys)
    assert row["px"] == 1.5 and row["asof_ts"] == 90


def test_cli_forget_and_triangles(spark, tmp_path, capsys):
    db = str(tmp_path / "fdb")
    ev = str(tmp_path / "fev.parquet")
    spark.createDataFrame(
        [Row(ts=0, x="a", y="u1", value=5.0), Row(ts=0, x="a", y="u2", value=3.0)]
    ).write.parquet(ev)
    assert main(["init", "--path", db, "--duration", "5", "--resolution", "1",
                 "--retention", "10", "--fields", "x,y"]) == 0
    _out(capsys)
    assert main(["track", "--path", db, "--events", ev, "--total-col", "value"]) == 0
    _out(capsys)
    assert main(["forget", "--path", db, "--pattern", "*,u1"]) == 0
    (res,) = _out(capsys)
    assert res["forgotten_rows"] == 1
    assert main(["fetch", "--path", db, "--from-ns", "0", "--to-ns", "1",
                 "--pattern", "a,*"]) == 0
    rows = _out(capsys)
    assert rows[0]["total"] == 3.0

    edges = str(tmp_path / "tedges.parquet")
    spark.createDataFrame([Row(src=1, dst=2), Row(src=2, dst=3), Row(src=1, dst=3)]).write.parquet(edges)
    assert main(["triangles", "--edges", edges]) == 0
    rows = _out(capsys)
    assert {r["node"] for r in rows} == {1, 2, 3}
    assert all(r["n_triangles"] == 1 for r in rows)


def test_cli_kmeans_luhn_dqaudit_scriptcensus(spark, tmp_path, capsys):
    emb = str(tmp_path / "emb.parquet")
    spark.createDataFrame(
        [(i, [float(i % 4), float(i % 2)]) for i in range(12)],
        "vec_id long, embedding array<double>",
    ).write.parquet(emb)
    assert main(["kmeans", "--table", emb, "--k", "2", "--iters", "1"]) == 0
    rows = _out(capsys)
    assert sum(r["n_vecs"] for r in rows) == 12
    assert all(r["inertia"] >= 0 for r in rows)

    docs = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(0, "a", "pay 4111111111111111 ok"), (1, "a", "no digits"),
         (2, "b", "ref 1234567890123456")],
        "doc_id long, source string, text string",
    ).write.parquet(docs)
    assert main(["luhn", "--table", docs, "--group-cols", "source"]) == 0
    got = {r["source"]: (r["n_candidates"], r["n_luhn_valid"]) for r in _out(capsys)}
    assert got == {"a": (1, 1), "b": (1, 0)}

    assert main([
        "dqaudit", "--table", docs,
        "--check", "id_nonneg=doc_id >= 0",
        "--check", "text_nonempty=length(text) > 0",
        "--ref", f"source:{docs}:source",
    ]) == 0
    audit = {r["check"]: r["n_violations"] for r in _out(capsys)}
    assert audit == {"id_nonneg": 0, "text_nonempty": 0, "source_in_source": 0}

    assert main(["scriptcensus", "--table", docs, "--group-cols", "source"]) == 0
    rows = _out(capsys)
    assert sum(r["n_docs"] for r in rows) == 3
    assert all(r["dominant_script"] == "latin" for r in rows)


def test_cli_semdedup_and_rulegroup(spark, tmp_path, capsys):
    from pyspark.sql import Row

    emb = str(tmp_path / "sd.parquet")
    spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.999, 0.001]), (2, [0.0, 1.0]),
         (3, [0.001, 0.999]), (4, [-1.0, 0.0])],
        "vec_id long, embedding array<double>",
    ).write.parquet(emb)
    assert main(["semdedup", "--table", emb, "--k", "2", "--iters", "1",
                 "--threshold", "0.95"]) == 0
    rows = _out(capsys)
    assert sum(r["n_vecs"] for r in rows) == 5
    assert sum(r["n_dropped"] for r in rows) == 2  # 1 dups 0, 3 dups 2
    assert main(["semdedup", "--table", emb, "--k", "2", "--iters", "1",
                 "--threshold", "0.95", "--per-vector"]) == 0
    kept = {r["vec_id"]: r["kept"] for r in _out(capsys)}
    assert kept == {0: 1, 1: 0, 2: 1, 3: 0, 4: 1}

    db = str(tmp_path / "rgdb")
    assert main(["init", "--path", db, "--duration", "100",
                 "--resolution", "1", "--retention", "1000",
                 "--fields", "x,y"]) == 0
    _out(capsys)
    ev = str(tmp_path / "rgev.parquet")
    spark.createDataFrame([
        Row(ts=1, x="a", y="u", value=4.0), Row(ts=2, x="a", y="u", value=3.0),
        Row(ts=3, x="a", y="u", value=1.0), Row(ts=5, x="a", y="u", value=9.0),
    ]).write.parquet(ev)
    assert main(["track", "--path", db, "--events", ev]) == 0
    _out(capsys)
    assert main(["rulegroup", "--path", db, "--from-ns", "0", "--to-ns", "10",
                 "--rule", "hot_a=a,*:3:2"]) == 0
    runs = _out(capsys)
    assert [(r["pending_start"], r["n_slots"]) for r in runs] == [(1, 2)]
    import pytest as _pt

    with _pt.raises(SystemExit):
        main(["rulegroup", "--path", db, "--from-ns", "0", "--to-ns", "10",
              "--rule", "badspec"])
    with _pt.raises(SystemExit):
        main(["rulegroup", "--path", db, "--from-ns", "0", "--to-ns", "10"])
