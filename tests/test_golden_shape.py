"""Golden-output shape test (SURVEY.md §5.2 item 3): re-derive the
reference's exact export shape — `ID,Name,English name,avg_rating`, 5 rows,
avg_rating strictly descending (recommendations_series.csv /
recommendations_movies.csv) — on synthetic fixtures, since the raw Kaggle
inputs are excluded from the reference snapshot (.gitignore:1)."""

from __future__ import annotations

import pytest

from recommendation_system_big_data_spark.operators.recommend import enrich_and_rank


@pytest.fixture(scope="module")
def anime_fixture(spark):
    rows = []
    for i in range(1, 41):
        rows.append(
            (
                i,
                f"Anime {i}",
                f"Anime {i} EN" if i % 3 else None,  # 'Unknown'-style NULLs
                "TV" if i % 2 else "Movie",
            )
        )
    return spark.createDataFrame(rows, ["ID", "Name", "English name", "Type"])


@pytest.fixture(scope="module")
def ratings_fixture(spark):
    rows = []
    for anime_id in range(1, 41):
        for user in range(1, 6):
            rows.append((user, anime_id, float((anime_id * 7 + user * 3) % 10) + 0.5))
    return spark.createDataFrame(rows, ["user_id", "anime_id", "rating"])


@pytest.fixture(scope="module")
def recs_fixture(spark):
    # a user's top-30 recommendations, model-als.py:139 shape
    rows = [(i, 10.0 - i * 0.1) for i in range(1, 31)]
    return spark.createDataFrame(rows, ["anime_id", "predicted_rating"])


@pytest.mark.parametrize("type_value", ["TV", "Movie"])
def test_golden_output_shape(spark, anime_fixture, ratings_fixture, recs_fixture, type_value):
    out = enrich_and_rank(recs_fixture, anime_fixture, ratings_fixture, type_value)
    rows = out.collect()
    # exact golden schema and row count (recommendations_series.csv:1-6)
    assert out.columns == ["ID", "Name", "English name", "avg_rating"]
    assert len(rows) == 5
    # descending by avg_rating, exactly as the reference's sort+limit
    vals = [r["avg_rating"] for r in rows]
    assert vals == sorted(vals, reverse=True)
    # only the requested media type's titles appear
    ids = {r["ID"] for r in rows}
    want_parity = 1 if type_value == "TV" else 0
    assert all(i % 2 == want_parity for i in ids)


def test_golden_output_deterministic(spark, anime_fixture, ratings_fixture, recs_fixture):
    a = enrich_and_rank(recs_fixture, anime_fixture, ratings_fixture, "TV").collect()
    b = enrich_and_rank(recs_fixture, anime_fixture, ratings_fixture, "TV").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
