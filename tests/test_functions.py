"""Unit tests for the scalar kernels — parity with the reference semantics
(/root/reference/pkg/scraper/mixup.go, pkg/item/currency.go, pkg/ciphersuite)."""

from gocrawler_ray.functions import (
    absolutize,
    cents_to_float,
    collapse_spaces,
    format_cents,
    item_id,
    md5_hex,
    multiply_cents,
    normalize_kv,
    normalize_review,
    parse_price_text,
    request_id,
    split_blocks,
    to_cents,
)
from gocrawler_ray.functions.text import positional_parse
from gocrawler_ray.config import MIXUP, AMAZON


def test_md5_matches_reference_hash():
    # echo -n hello | md5sum
    assert md5_hex("hello") == "5d41402abc4b2a76b9719d911017c592"
    assert item_id("Some Product", "Mixup") == md5_hex("Some Product/Mixup")
    assert request_id("https://x/y") == md5_hex("https://x/y")


def test_currency_round_half_up_truncation():
    # currency.go:10-12 — int64(f*100 + 0.5)
    assert to_cents(1.23) == 123
    assert to_cents(1.345) == 135
    assert to_cents(0.004) == 0
    assert to_cents(0.005) == 1
    assert cents_to_float(135) == 1.35
    assert multiply_cents(199, 1.5) == 299  # 298.5 + .5 → 299
    assert format_cents(123456) == "$1234.56"


def test_space_cleaner_deletes_runs():
    # mixup.go:185 replaces runs of 2+ spaces with EMPTY string
    assert collapse_spaces("a  b   c d") == "abc d"


def test_divider_split():
    # Go regexp.Split drops capture groups — ours must match that
    assert split_blocks("a\r\n\r\tb\nc") == ["a", "b", "c"]


def test_kv_and_review_normalizers():
    assert normalize_kv("Peso del producto:  \n100 g") == "Peso del producto100 g"
    assert normalize_review("nice:  very\n\nnice") == "nice:verynice"


def test_price_parse_chain():
    assert parse_price_text("Precio:  $1,234.56") == 123456
    assert parse_price_text("Precio: $0.99") == 99
    assert parse_price_text("Precio:") is None
    assert parse_price_text("sin dos puntos") is None
    assert parse_price_text("Precio: no-num") is None


def test_positional_parse():
    name, brand, details = positional_parse(
        ["", "  Producto X  ", "Sony", "Formato: CD", "sin valor", "Peso: 100 g: extra"]
    )
    assert name == "Producto X"
    assert brand == "Sony"
    # only first ':' pair is taken (Go indices 0/1 of the split)
    assert details == {"Formato": "CD", "Peso": "100 g"}


def test_absolutize():
    assert (
        absolutize("https://h/shop/cat.aspx?etq=c1", "detproducto.aspx?sku=9")
        == "https://h/shop/detproducto.aspx?sku=9"
    )
    assert absolutize("https://h/shop/x", "https://other/y") == "https://other/y"


def test_reference_regex_parity_mixup():
    ex = MIXUP.extraction_re()
    pr = MIXUP.product_re()
    ok = "https://www.mixup.com.mx/Mixup/detproducto.aspx?sku=1234567890123"
    assert ex.search(ok) and pr.search(ok)
    assert ex.search("https://www.mixup.com.mx/mixup/Home.aspx")
    assert ex.search("https://www.mixup.com.mx/Mixup/Categoria.aspx?etq=rock")
    # short sku: visitable but not a product page
    short = "https://www.mixup.com.mx/Mixup/detproducto.aspx?sku=123"
    assert ex.search(short) and not pr.search(short)
    assert not ex.search("https://www.mixup.com.mx/Mixup/other.aspx")
    assert not ex.search("https://www.evil.com/Mixup/detproducto.aspx?sku=123")


def test_reference_regex_parity_amazon():
    ex = AMAZON.extraction_re()
    pr = AMAZON.product_re()
    dp = "https://www.amazon.com.mx/gp/product/dp/B08N5WRWNW/ref=x"
    assert ex.search(dp) and pr.search(dp)
    assert ex.search("https://www.amazon.com/s?k=discos")
    assert not pr.search("https://www.amazon.com/s?k=discos")


def test_m18_timestamp_kernels():
    """M18: UnixDate format/parse roundtrip (scraper.go:119,126), RFC3339
    marshal, durafmt strings, Comment.Date zero-time repr (item.go:326)."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from gocrawler_ray.functions.times import (
        ZERO_COMMENT_DATE,
        durafmt_ms,
        format_comment_date_many,
        format_unixdate_many,
        parse_unixdate_many,
        to_rfc3339_many,
    )

    ms = np.array([0, 999, 1000, 61_123, 86_400_000])
    u = format_unixdate_many(ms)
    assert u[0] == "Mon Jan  2 15:04:05 UTC 2006"  # the layout instant
    # roundtrip truncates to seconds exactly like Go's UnixDate layout
    assert (parse_unixdate_many(u) == ms // 1000 * 1000).all()

    r = to_rfc3339_many(ms)
    assert list(r[:3]) == [
        "2006-01-02T15:04:05Z",
        "2006-01-02T15:04:05.999Z",
        "2006-01-02T15:04:06Z",
    ]

    assert durafmt_ms(0) == "0 milliseconds"
    assert durafmt_ms(1) == "1 millisecond"
    assert durafmt_ms(61_123) == "1 minute 1 second 123 milliseconds"
    assert durafmt_ms(7 * 24 * 3_600_000) == "1 week"

    assert list(format_comment_date_many(2)) == [ZERO_COMMENT_DATE] * 2

    @settings(max_examples=50, deadline=None)
    @given(st.lists(st.integers(0, 10**10), min_size=1, max_size=20))
    def roundtrip(vals):
        a = np.array(vals, dtype=np.int64)
        assert (parse_unixdate_many(format_unixdate_many(a)) == a // 1000 * 1000).all()

    roundtrip()


def test_absolutize_many_matches_urljoin():
    """Vectorized M4 kernel is byte-equal to per-row urljoin, including
    the odd shapes that take the fallback path."""
    import numpy as np
    from urllib.parse import urljoin

    from gocrawler_ray.functions.urls import absolutize_many

    cases = [
        ("https://a.mx/shop/cat.aspx?x=1", "det.aspx?sku=42"),
        ("https://a.mx/shop/cat.aspx", "/rooted/path?q=1"),
        ("https://a.mx/shop/sub/dir/page", "sibling.html#frag"),
        ("https://a.mx/shop/cat.aspx", "https://other.mx/abs"),
        ("https://a.mx/shop/cat.aspx", "?onlyquery=1"),
        ("https://a.mx/shop/cat.aspx", "#frag"),
        ("https://a.mx/shop/a/b/c", "../up.html"),
        ("https://a.mx/shop/a/b/c", "./here.html"),
        ("https://a.mx/shop/a/b/c", "x/../y.html"),
        ("https://a.mx", "nopath.html"),          # base without path slash
        ("https://a.mx/shop/", "//proto.mx/rel"),  # protocol-relative
        ("https://a.mx/shop/page", ""),
        ("http://a.mx/p", "det.aspx"),
    ]
    srcs = np.array([c[0] for c in cases], dtype=object)
    hrefs = np.array([c[1] for c in cases], dtype=object)
    got = absolutize_many(srcs, hrefs)
    want = [urljoin(s, h) if not h.startswith("http") else h for s, h in cases]
    assert list(got) == want

    # empty input
    z = np.zeros(0, dtype=object)
    assert list(absolutize_many(z, z)) == []


def test_round_half_away_matches_duckdb():
    """DuckDB round() is half-AWAY-from-zero; np.round is half-to-even.
    The helper must match DuckDB exactly on decimal ties (1/128 at 6dp),
    near-tie binary edge cases, and ordinary values."""
    import duckdb
    import numpy as np
    import pyarrow as pa

    from gocrawler_ray.functions.numeric import round_half_away

    rng = np.random.default_rng(3)
    vals = np.concatenate([
        rng.normal(0, 50, 5000),
        np.arange(1, 1025) / 128.0, -(np.arange(1, 1025) / 128.0),
        np.array([0.5, -0.5, 2.5, -2.5, 0.0078125,
                  0.49999999999999994, -0.49999999999999994, 0.0, -0.0]),
    ])
    con = duckdb.connect()
    con.register("t", pa.table({"x": vals}))
    for nd in (0, 2, 6):
        mine = round_half_away(vals, nd)
        theirs = np.array(
            [r[0] for r in con.sql(f"select round(x,{nd}) from t").fetchall()]
        )
        assert (mine == theirs).all()
    # the canonical advisor case: percent_rank 1/128 with 129 rows
    assert round_half_away(np.array([1 / 128]), 6)[0] == 0.007813
    assert np.round(1 / 128, 6) == 0.007812  # numpy alone would mismatch


def test_json_int_field_anchored_and_strict():
    import pyarrow as pa

    from gocrawler_ray.functions.text import json_int_field

    col = pa.array([
        '{"k": 7, "x": 1}',          # flat int -> 7
        '{"x": {"k": 5}}',           # nested same-name key
        '{"k": 1.5}',                # float: anchored regex must NOT truncate to 1
        '{"s": "no k here"}',        # missing -> -1
        '{"kk": 3}',                 # key is a strict token, not a prefix match
        None,
    ])
    fast = json_int_field(col, "k").to_pylist()
    assert fast[0] == 7
    assert fast[2] == -1 and fast[3] == -1 and fast[4] == -1
    strict = json_int_field(col, "k", strict=True).to_pylist()
    # strict json.loads sees nesting depth: top-level k only
    assert strict == [7, -1, -1, -1, -1, -1]


def test_md5_hex_arrow_zero_copy_variants():
    """Zero-copy Arrow md5 must equal hashlib on plain, null, unicode,
    sliced (nonzero offset), chunked, and binary inputs."""
    import hashlib

    import pyarrow as pa

    from gocrawler_ray.functions.urls import md5_hex_arrow

    ref = lambda vals: [
        hashlib.md5((v or ("" if isinstance(v, str) or v is None else b"")).encode()
                    if isinstance(v, str) or v is None else (v or b"")).hexdigest()
        for v in vals
    ]
    arr = pa.array(["hello", "", None, "Ω unicode ≠", "x" * 500])
    assert md5_hex_arrow(arr) == ref(arr.to_pylist())
    sl = arr.slice(2, 3)
    assert md5_hex_arrow(sl) == ref(sl.to_pylist())
    ch = pa.chunked_array([["a", "b"], ["c", None]])
    assert md5_hex_arrow(ch) == ref(ch.to_pylist())
    bn = pa.array([b"ab", None, b"\x00\xff"])
    assert md5_hex_arrow(bn) == [
        hashlib.md5(x or b"").hexdigest() for x in bn.to_pylist()
    ]
    assert md5_hex_arrow(pa.array([], pa.string())) == []


class TestFlatTokensNgrams:
    """Vectorized flat-token/n-gram kernels vs a per-row brute force."""

    def test_ngrams_match_brute_force(self):
        import numpy as np
        import pandas as pd
        from hypothesis import given, settings, strategies as st

        from gocrawler_ray.pipelines.queries import _flat_tokens, _word_ngrams

        words = st.sampled_from(["a", "bb", "ccc", "dd", "e"])
        texts = st.lists(
            st.lists(words, min_size=0, max_size=8).map(" ".join),
            min_size=0, max_size=6,
        )

        @settings(max_examples=200, deadline=None)
        @given(texts=texts, n=st.integers(min_value=1, max_value=4))
        def check(texts, n):
            flat, di = _flat_tokens(pd.Series(texts, dtype=object))
            grams, gdi = _word_ngrams(flat, di, n)
            expect = []
            for i, t in enumerate(texts):
                ws = t.split()
                expect += [(" ".join(ws[j:j + n]), i)
                           for j in range(len(ws) - n + 1)]
            got = list(zip(grams.tolist(), gdi.tolist()))
            assert got == expect

        check()

    def test_empty_and_null(self):
        import pandas as pd

        from gocrawler_ray.pipelines.queries import _flat_tokens, _word_ngrams

        flat, di = _flat_tokens(pd.Series([None, "", "x y"], dtype=object))
        assert flat.tolist() == ["x", "y"] and di.tolist() == [2, 2]
        grams, gdi = _word_ngrams(flat, di, 2)
        assert grams.tolist() == ["x y"] and gdi.tolist() == [2]
