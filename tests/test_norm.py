"""Normalization kernel tests — semantics pinned to the reference code."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from housenumbercore_spark.norm import housenumbers as HN
from housenumbercore_spark.norm import names as NM


def _vals(spark, col, data):
    df = spark.createDataFrame([(d,) for d in data], "v string")
    return [r.o for r in df.select(col.alias("o")).collect()]


def _vals2(spark, colf, data):
    df = spark.createDataFrame(data, "v string, cc string")
    return [r.o for r in df.select(colf(F.col("v"), F.col("cc")).alias("o")).collect()]


class TestSortable:
    # Address.java:337-360 examples from the inline comment
    def test_examples(self, spark):
        got = _vals(
            spark,
            HN.housenumber_sortable("v"),
            ["1", "47 1/2", "11 1/128b", "13a", "12345", "a"],
        )
        assert got == ["0001", "0047 1/2", "0011 1/128b", "0013a", "12345", "0000a"]

    def test_sql_twin_matches(self, spark):
        import duckdb

        data = ["1", "47 1/2", "11 1/128b", "13a", "12345", "a", ""]
        got = _vals(spark, HN.housenumber_sortable("v"), data)
        con = duckdb.connect()
        con.register("t", __import__("pandas").DataFrame({"v": data}))
        want = [
            r[0]
            for r in con.execute(
                f"select {HN.housenumber_sortable_sql('v')} from t"
            ).fetchall()
        ]
        assert got == want


class TestSplitExpand:
    def test_split_multi(self, spark):
        got = _vals(spark, HN.split_multi("v"), ["1,3;5", "7", " 2 ; 4 "])
        assert got == [["1", "3", "5"], ["7"], ["2", "4"]]

    def test_expand_range(self, spark):
        got = _vals(
            spark,
            HN.expand_range("v"),
            ["2-8", "1-5", "8-2", "2-8a", "13a", "3", "1-2-3"],
        )
        assert got == [
            ["2", "4", "6", "8"],
            ["1", "3", "5"],
            [],  # end <= start → empty (row dropped), TheoreticalHousenumbers.java:303
            [],  # parse failure → empty, :307-311
            ["13a"],
            ["3"],
            [],  # two dashes → substring_index parse differs; reference would NumberFormatException → empty
        ]

    def test_explode_pipeline(self, spark):
        df = spark.createDataFrame(
            [(1, "1,3"), (2, "2-6"), (3, "9-5"), (4, "7b")], "id int, housenumber string"
        )
        out = HN.explode_housenumbers(df).orderBy("id", "housenumber")
        rows = [(r.id, r.housenumber) for r in out.collect()]
        assert rows == [(1, "1"), (1, "3"), (2, "2"), (2, "4"), (2, "6"), (4, "7b")]


class TestNames:
    def test_correctorder(self, spark):
        got = _vals(spark, NM.correctorder("v"), ["Große Straße", "ÄÖÜ", "Câmp"])
        assert got == ["grosse strasse", "aeoeue", "camp"]

    def test_correctorder_sql_twin(self, spark):
        import duckdb

        data = ["Große Straße", "ÄÖÜ", "Câmp", "Mühlenweg"]
        got = _vals(spark, NM.correctorder("v"), data)
        con = duckdb.connect()
        con.register("t", __import__("pandas").DataFrame({"v": data}))
        want = [
            r[0]
            for r in con.execute(f"select {NM.correctorder_sql('v')} from t").fetchall()
        ]
        assert got == want

    def test_normalize_street_name_ro(self, spark):
        got = _vals2(
            spark,
            NM.normalize_street_name,
            [("Strada Mihai", "RO"), ("Strada Mihai", "DE"), ("Calea X", "RO")],
        )
        assert got == ["Mihai", "Strada Mihai", "Calea X"]

    def test_title_case(self, spark):
        got = _vals(
            spark,
            NM.title_case_street("v"),
            ["VIA DELLA ROSA", "HAUPTSTRASSE", "Schon Richtig", "VIA II GIUGNO"],
        )
        assert got == ["Via della Rosa", "Hauptstrasse", "Schon Richtig", "Via II Giugno"]

    def test_ags(self, spark):
        got = _vals(spark, NM.normalize_ags("v"), ["03 1 52 012", "0315", "05334002"])
        assert got == ["03152012", "03150000", "05334002"]
        variants = _vals(spark, NM.ags_lookup_variants("v"), ["03152012"])[0]
        assert "03152012" in variants and "03 1 52 012" in variants

    def test_boundary_name_variants(self, spark):
        v = _vals(spark, NM.boundary_name_variants("v"), ["Rothenburg ob der Tauber"])[0]
        assert "Rothenburg" in v
        v2 = _vals(spark, NM.boundary_name_variants("v"), ["Aachen, Stadt"])[0]
        assert "Aachen" in v2

    def test_hstore_roundtrip(self, spark):
        df = spark.createDataFrame(
            [('"name"=>"Aachen", "boundary"=>"administrative"',)], "v string"
        )
        m = df.select(NM.hstore_to_map("v").alias("m")).collect()[0].m
        assert m == {"name": "Aachen", "boundary": "administrative"}
        back = (
            df.select(NM.map_to_hstore(NM.hstore_to_map("v")).alias("s"))
            .collect()[0]
            .s
        )
        assert '"name"=>"Aachen"' in back


class TestTitleCaseRuns:
    """Review regressions: uppercase runs inside hyphen/period-joined
    tokens rewrite individually, and the IT exception lists gate on the
    import country when one is given."""

    def test_hyphen_and_period_joined_runs(self, spark):
        from housenumbercore_spark.norm import names as NM

        df = spark.createDataFrame(
            [("CORSO VITTORIO-EMANUELE",), ("S.MARIA DEL CARMINE",),
             ("VIA ROMA,",)],
            "raw string",
        )
        got = [r.t for r in
               df.select(NM.title_case_street("raw").alias("t")).collect()]
        assert got == [
            "Corso Vittorio-Emanuele",
            "S.Maria del Carmine",  # 'S' is a 1-letter run -> kept; DEL folds
            "Via Roma,",
        ]

    def test_country_gates_particle_lists(self, spark):
        from housenumbercore_spark.norm import names as NM

        df = spark.createDataFrame(
            [("IN DER AU", "DE"), ("VIA DELLA LIBERTÀ", "IT")],
            "raw string, cc string",
        )
        got = {
            r.cc: r.t
            for r in df.select(
                "cc", NM.title_case_street("raw", "cc").alias("t")
            ).collect()
        }
        # German list: 'IN' is NOT folded by the Italian particle list
        assert got["DE"] == "In Der Au"
        # run-in-place parity (CsvReader.java regex): the run 'LIBERT'
        # folds even though À (outside the run class) follows it
        assert got["IT"] == "Via della LibertÀ"


class TestHstoreEscaping:
    def test_roundtrip_quotes_and_backslashes(self, spark):
        from housenumbercore_spark.norm import names as NM

        df = spark.createDataFrame(
            [({"note": 'a", "b', "path": "C:\\tmp", "plain": "x"},)],
            "m map<string,string>",
        )
        out = df.select(
            NM.hstore_to_map(NM.map_to_hstore("m")).alias("rt")
        ).collect()[0].rt
        assert out == {"note": 'a", "b', "path": "C:\\tmp", "plain": "x"}

    def test_parse_escaped_value(self, spark):
        from housenumbercore_spark.norm import names as NM

        df = spark.createDataFrame(
            [('"note"=>"a\\", \\"b", "k"=>"v"',)], "h string"
        )
        out = df.select(NM.hstore_to_map("h").alias("m")).collect()[0].m
        assert out == {"note": 'a", "b', "k": "v"}


class TestRunInPlaceTitleCase:
    def test_runs_inside_mixed_tokens_fold(self, spark):
        """Reference parity (CsvReader.java StreetToUpperLower regex):
        uppercase runs fold ANYWHERE in a token, not only whole tokens."""
        from housenumbercore_spark.norm import names as NM

        df = spark.createDataFrame(
            [("McDONALD",), ("O'BRIEN",), ("VIA DELLA LIBERTÀ",)],
            "raw string",
        )
        got = [r.t for r in
               df.select(NM.title_case_street("raw").alias("t")).collect()]
        assert got == ["McDonald", "O'Brien", "Via della LibertÀ"]


class TestHstoreEdges:
    def test_value_ending_in_backslash_roundtrips(self, spark):
        from housenumbercore_spark.norm import names as NM

        df = spark.createDataFrame(
            [({"a": "x\\", "b": "y"},)], "m map<string,string>"
        )
        out = df.select(
            NM.hstore_to_map(NM.map_to_hstore("m")).alias("rt")
        ).collect()[0].rt
        assert out == {"a": "x\\", "b": "y"}

    def test_null_values_parse_and_serialize(self, spark):
        from housenumbercore_spark.norm import names as NM

        df = spark.createDataFrame([('"a"=>NULL, "b"=>"x"',)], "h string")
        out = df.select(NM.hstore_to_map("h").alias("m")).collect()[0].m
        assert out == {"a": None, "b": "x"}
        df2 = spark.createDataFrame(
            [({"n": None, "k": "v"},)], "m map<string,string>"
        )
        s = df2.select(NM.map_to_hstore("m").alias("s")).collect()[0].s
        assert '"n"=>NULL' in s and '"k"=>"v"' in s
        rt = df2.select(
            NM.hstore_to_map(NM.map_to_hstore("m")).alias("rt")
        ).collect()[0].rt
        assert rt == {"n": None, "k": "v"}


class TestRangeExpandGuards:
    def test_overflow_bound_is_parse_failure_not_crash(self, spark):
        """ANSI-mode plain cast aborted the job on '1-99999999999'; the
        try_cast treats the overflow as a parse failure -> []."""
        from housenumbercore_spark.norm import housenumbers as HN
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("1-99999999999",), ("1-200000001",), ("2-8",)], "hnr string"
        )
        got = {r.hnr: r.e for r in
               df.select("hnr", HN.expand_range("hnr").alias("e")).collect()}
        assert got["1-99999999999"] == []
        assert got["1-200000001"] == []  # span beyond RANGE_EXPAND_CAP
        assert got["2-8"] == ["2", "4", "6", "8"]
