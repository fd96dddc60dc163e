"""CLI front-end (reference A7): spelling correction over a plain-text
dictionary file, exact candidate sets and distances."""

from __future__ import annotations


def test_cli_spelling_correction(spark, tmp_path, capsys, monkeypatch):
    from liblevenshtein_spark import cli

    dict_file = tmp_path / "terms.txt"
    dict_file.write_text("kitten\nsitting\nmitten\nsmitten\nmittens\n")
    # build_session getOrCreate()s into the test session; stop() is a no-op
    # we must avoid so later tests keep their fixture
    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    cli.main(["--dictionary", str(dict_file), "-n", "2", "mitten", "kiten"])
    out = [tuple(l.split("\t")) for l in capsys.readouterr().out.strip().splitlines()]
    assert out == [
        ("kiten", "kitten", "1"),
        ("kiten", "mitten", "2"),
        ("mitten", "mitten", "0"),
        ("mitten", "kitten", "1"),
        ("mitten", "mittens", "1"),
        ("mitten", "smitten", "1"),
    ]
