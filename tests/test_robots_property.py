"""Property test: the native RFC 9309 wildcard matcher (admission.
rule_matches over compiled segment arrays) must agree with an independent
pure-Python regex reference on randomized patterns and paths.

The reference translation is the protocol's own: collapse runs of '*',
a trailing '$' anchors the end (elsewhere literal), every '*' bridges any
character sequence, match is anchored at the START of the path. One seed,
hundreds of pairs, ONE Spark job (no per-example session overhead)."""

import random
import re

from pyspark.sql import functions as F

from webcrawler_spark.operators.admission import rule_matches
from webcrawler_spark.sources.robots import compiled_rule_cols


def _ref_matches(pattern: str, path: str) -> bool:
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    body = re.sub(r"\*+", "*", body)
    if not anchored:
        body = body.rstrip("*")
    rx = "^" + ".*".join(re.escape(seg) for seg in body.split("*"))
    if anchored:
        rx += "$"
    return re.search(rx, path) is not None


def _random_cases(n: int, seed: int) -> list[tuple[str, str]]:
    rng = random.Random(seed)
    pat_alpha = "ab/.*$"
    path_alpha = "ab/."
    cases = []
    for _ in range(n):
        pat = "/" + "".join(
            rng.choice(pat_alpha) for _ in range(rng.randint(0, 8))
        )
        path = "/" + "".join(
            rng.choice(path_alpha) for _ in range(rng.randint(0, 10))
        )
        cases.append((pat, path))
    # adversarial fixed cases: overlap-at-end, star-dollar, empty tails
    cases += [
        ("/a*a$", "/aa"), ("/a*a$", "/aba"), ("/a*a$", "/ab"),
        ("/ab*ab$", "/abab"), ("/ab*ab$", "/abcab"), ("/ab*ab$", "/ab"),
        ("/*$", "/x"), ("/$", "/"), ("/$", "/x"), ("/**a", "/za"),
        ("/a$b", "/a$b"), ("/a$b", "/ab"), ("/a*", "/a"), ("/a*", "/"),
        ("/aa*a$", "/aaa"), ("/aa*a$", "/aa"),
    ]
    return cases


def test_wildcard_matcher_matches_regex_reference(spark):
    cases = _random_cases(600, seed=1234)
    df = spark.createDataFrame(cases, "pattern string, path string")
    rule = F.struct(
        F.col("pattern").alias("prefix"),
        F.lit(False).alias("allow"),
        *compiled_rule_cols("pattern"),
    )
    got = {
        (r["pattern"], r["path"]): r["m"]
        for r in df.select(
            "pattern", "path",
            rule_matches(F.col("path"), rule).alias("m"),
        ).collect()
    }
    bad = [
        (pat, path, got[(pat, path)], _ref_matches(pat, path))
        for pat, path in set(cases)
        if bool(got[(pat, path)]) != _ref_matches(pat, path)
    ]
    assert not bad, f"{len(bad)} disagreements, first 10: {bad[:10]}"
