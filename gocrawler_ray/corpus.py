"""Deterministic synthetic web corpus (the authoritative input table).

Produces exactly the ``input_hint`` shape —
``doc_id: string, spans: list<struct<kind, text, media_ref, offset:int32>>``
— plus the ``hosts`` / ``seeds`` sidecars (FIXTURES.md §1-3). Everything
is a pure function of ``(seed, n_docs, n_hosts)``: no wall clock, no
global RNG.

Content invariants mirror the reference parse semantics:

- span order is semantic (SURVEY §2.2 M7): first ``text`` span = product
  name, second = brand (positional parse,
  /root/reference/pkg/scraper/mixup.go:188-210); later ``text`` spans are
  description blocks; ``detail`` spans are ``"Key: Value"`` lines;
- ``price`` span text is ``"Precio: $1,234.56"`` (exercises the
  strip/parse chain, /root/reference/pkg/scraper/mixup.go:125-148);
- ``review`` spans carry ``author␟"4.0 out of 5 stars"␟title␟content``
  (stars = first whitespace field, /root/reference/pkg/scraper/amazon.go:253);
- ``link`` spans carry relative AND absolute hrefs (absolutization,
  /root/reference/pkg/scraper/scraper.go:190), a controlled fraction
  matching / not matching the URL-filter regex, on- and off-domain;
- a deterministic fraction of product pages are captcha walls (single
  ``captcha`` span, /root/reference/pkg/scraper/amazon.go:290-295);
- duplicate link targets appear across pages (URL-seen dedup);
- host page-counts are Zipf-skewed with host 0 designated hot (salting).
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq

from .config import ShopProfile, synth_profile

REVIEW_SEP = "\x1f"
_GENERATOR_VERSION = 2  # bump when generate() output changes (cache key)

SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
CORPUS_SCHEMA = pa.schema(
    [("doc_id", pa.string()), ("spans", pa.list_(SPAN_TYPE))]
)
HOSTS_SCHEMA = pa.schema(
    [
        ("host", pa.string()),
        ("allowed", pa.bool_()),
        ("robots_disallow", pa.list_(pa.string())),
        ("crawl_delay_ms", pa.int32()),
        ("max_parallel", pa.int32()),
        ("fetch_latency_ms", pa.int32()),
    ]
)
SEEDS_SCHEMA = pa.schema(
    [("url", pa.string()), ("priority", pa.int32()), ("seq", pa.int64())]
)

_BRANDS = ["Sony", "Warner", "Universal", "EMI", "Fonovisa", "Indie"]
_DETAIL_KEYS = ["Formato", "Genero", "Discos", "Idioma", "Region", "Peso"]
_WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua"
).split()


@dataclass(frozen=True)
class CorpusSpec:
    seed: int = 42
    n_docs: int = 1000
    n_hosts: int = 4
    captcha_mod: int = 23  # every k-th product is a captcha wall
    dangling_mod: int = 17  # every k-th product link points at a missing page
    n_seeds: int = 2


def _zipf_counts(n_docs: int, n_hosts: int) -> list[int]:
    w = [1.0 / (i + 1) for i in range(n_hosts)]
    tot = sum(w)
    counts = [max(3, int(n_docs * x / tot)) for x in w]
    counts[0] += n_docs - sum(counts)
    return counts


def hosts_of(spec: CorpusSpec) -> list[str]:
    return [f"www.synth{i}.mx" for i in range(spec.n_hosts)]


def profile_of(spec: CorpusSpec) -> ShopProfile:
    return synth_profile(tuple(hosts_of(spec)))


def _prod_url(host: str, h: int, j: int) -> str:
    sku = 10**12 + h * 10**7 + j
    return f"https://{host}/shop/detproducto.aspx?sku={sku}"


def _cat_url(host: str, k: int, blocked: bool = False) -> str:
    tag = f"z{k}" if blocked else f"c{k}"
    return f"https://{host}/shop/cat.aspx?etq={tag}"


def _home_url(host: str) -> str:
    return f"https://{host}/shop/home.aspx"


def _text(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _host_params(spec: CorpusSpec, h: int) -> tuple[str, int, int, int]:
    host = hosts_of(spec)[h]
    n_h = _zipf_counts(spec.n_docs, spec.n_hosts)[h]
    n_cat = max(1, n_h // 8)
    n_blocked = max(1, n_cat // 6)
    n_prod = max(1, n_h - n_cat - n_blocked - 1)
    return host, n_cat, n_blocked, n_prod


def _host_meta_pages(spec: CorpusSpec, h: int) -> tuple[list[str], list[list[dict]]]:
    """Home + category (+ robots-blocked) pages of one host."""
    host, n_cat, n_blocked, n_prod = _host_params(spec, h)
    cat_urls = [_cat_url(host, k) for k in range(n_cat)]
    blocked_urls = [_cat_url(host, k, blocked=True) for k in range(n_blocked)]
    doc_ids: list[str] = []
    spans_col: list[list[dict]] = []

    spans: list[dict] = []
    off = 0

    def add(kind, text="", media_ref=""):
        nonlocal off
        spans.append(
            {"kind": kind, "text": text, "media_ref": media_ref, "offset": off}
        )
        off += 1

    # home page: links to the first categories + one off-domain + one
    # non-matching on-domain url
    add("text", f"Synth shop {host}")
    for k in range(min(n_cat, 12)):
        # alternate absolute and relative hrefs
        href = cat_urls[k] if k % 2 == 0 else f"cat.aspx?etq=c{k}"
        add("link", f"Categoria {k}", href)
    for k in range(n_blocked):
        add("link", f"Bloqueada {k}", blocked_urls[k])
    add("link", "afuera", "https://www.offdomain.com/x")
    add("link", "nomatch", f"https://{host}/shop/other.aspx")
    doc_ids.append(_home_url(host))
    spans_col.append(spans)

    for k in range(n_cat + n_blocked):
        blocked = k >= n_cat
        url = blocked_urls[k - n_cat] if blocked else cat_urls[k]
        spans = []
        off = 0
        add("text", f"Categoria {'z' if blocked else 'c'}{k} en {host}")
        add("media", "", f"https://cdn.{host}/cat{k}.jpg")
        # products of this category: strided slice → duplicate targets
        # across neighboring categories
        for j in range(k * 7, k * 7 + 14):
            jj = j % n_prod
            if jj % spec.dangling_mod == 0 and jj > 0:
                # dangling: page that does not exist in the corpus
                add("link", f"roto {jj}", _prod_url(host, h, n_prod + jj))
            elif j % 3 == 0:
                add("link", f"Producto {jj}", f"detproducto.aspx?sku={10**12 + h * 10**7 + jj}")
            else:
                add("link", f"Producto {jj}", _prod_url(host, h, jj))
        if not blocked:
            # 4-ary category tree (+ wraparound cycles near the leaves):
            # crawl depth ≈ log4(n_cat), so bench waves stay few and FAT
            # — the realistic web-BFS shape (breadth explodes) and the
            # shape wave-synchronous scaling needs
            for j in range(4):
                add("link", f"child{j}", _cat_url(host, (4 * k + 1 + j) % n_cat))
        add("link", "nomatch2", f"https://{host}/admin/panel.aspx")
        doc_ids.append(url)
        spans_col.append(spans)
    return doc_ids, spans_col


def _host_product_chunk(
    spec: CorpusSpec, h: int, j0: int, j1: int
) -> tuple[list[str], list[list[dict]]]:
    """Product pages j0..j1 of one host — independently generatable
    (every page is a pure function of (seed, h, j)), which is what makes
    parallel corpus generation possible."""
    host, n_cat, n_blocked, n_prod = _host_params(spec, h)
    doc_ids: list[str] = []
    spans_col: list[list[dict]] = []
    for j in range(j0, min(j1, n_prod)):
        url = _prod_url(host, h, j)
        spans = []
        off = 0

        def add(kind, text="", media_ref=""):
            nonlocal off
            spans.append(
                {"kind": kind, "text": text, "media_ref": media_ref, "offset": off}
            )
            off += 1

        prng = random.Random((spec.seed, h, j).__repr__())
        if j % spec.captcha_mod == 0 and j > 0:
            add("captcha", "Type the characters you see in this image")
            doc_ids.append(url)
            spans_col.append(spans)
            continue
        name = f"Producto {h}-{j} {' '.join(_text(prng, 2).split())}"
        brand = prng.choice(_BRANDS)
        add("text", name)
        add("text", brand)
        for key in prng.sample(_DETAIL_KEYS, k=3):
            add("detail", f"{key}: {_text(prng, 1)}")
        # price with thousands separator and 2 decimals
        cents = prng.randrange(999, 2_500_000)
        add("price", "Precio:  ${:,.2f}".format(cents / 100))
        add("text", _text(prng, 12))  # description block
        add("media", "", f"https://cdn.{host}/img/{h}_{j}.jpg")
        for r in range(prng.randrange(0, 3)):
            stars = prng.randrange(0, 11) / 2
            add(
                "review",
                REVIEW_SEP.join(
                    [
                        f"user{prng.randrange(1000)}",
                        f"{stars} out of 5 stars",
                        _text(prng, 3),
                        _text(prng, 8) + "  con espacios",
                        # review-date text — present on the page, read
                        # and discarded by the parser (amazon.go:255)
                        f"Reseñado el {prng.randrange(1, 29)} de marzo de 20{prng.randrange(10, 24)}",
                    ]
                ),
            )
        # related products + back to category (duplicate targets)
        add("link", "rel", _prod_url(host, h, (j + 1) % n_prod))
        add("link", "rel2", f"detproducto.aspx?sku={10**12 + h * 10**7 + (j * 2 + 1) % n_prod}")
        add("link", "volver", _cat_url(host, (j * 7 // 14) % n_cat if n_cat else 0))
        doc_ids.append(url)
        spans_col.append(spans)
    return doc_ids, spans_col


def _chunks_of(spec: CorpusSpec, chunk: int = 200_000):
    """(h, kind, j0, j1) generation units covering the whole corpus."""
    for h in range(spec.n_hosts):
        _, _, _, n_prod = _host_params(spec, h)
        yield (h, "meta", 0, 0)
        for j0 in range(0, n_prod, chunk):
            yield (h, "prod", j0, min(n_prod, j0 + chunk))


def _chunk_table(spec: CorpusSpec, unit) -> pa.Table:
    h, kind, j0, j1 = unit
    if kind == "meta":
        doc_ids, spans_col = _host_meta_pages(spec, h)
    else:
        doc_ids, spans_col = _host_product_chunk(spec, h, j0, j1)
    return pa.Table.from_arrays(
        [
            pa.array(doc_ids, type=pa.string()),
            pa.array(spans_col, type=pa.list_(SPAN_TYPE)),
        ],
        schema=CORPUS_SCHEMA,
    )


def generate(spec: CorpusSpec) -> dict[str, pa.Table]:
    """Build the corpus/hosts/seeds tables fully in memory (test scales)."""
    hosts = hosts_of(spec)
    corpus = pa.concat_tables(
        [_chunk_table(spec, u) for u in _chunks_of(spec)]
    ).combine_chunks()

    host_rows = {
        "host": hosts + ["www.offdomain.com"],
        "allowed": [True] * len(hosts) + [False],
        "robots_disallow": [["/shop/cat.aspx?etq=z"] for _ in hosts] + [[]],
        "crawl_delay_ms": [500 + (i % 4) * 500 for i in range(len(hosts))] + [1000],
        "max_parallel": [4] * (len(hosts) + 1),
        "fetch_latency_ms": [50 + (i * 37) % 200 for i in range(len(hosts))] + [100],
    }
    hosts_tbl = pa.Table.from_pydict(host_rows, schema=HOSTS_SCHEMA)

    seed_urls = [_home_url(hosts[i % len(hosts)]) for i in range(spec.n_seeds)]
    seeds_tbl = pa.Table.from_pydict(
        {
            "url": seed_urls,
            "priority": [1] * len(seed_urls),
            "seq": list(range(len(seed_urls))),
        },
        schema=SEEDS_SCHEMA,
    )
    return {"corpus": corpus, "hosts": hosts_tbl, "seeds": seeds_tbl}


_PARALLEL_THRESHOLD = 400_000


def write(spec: CorpusSpec, out_dir: str) -> dict[str, str]:
    """Materialize the corpus to ``out_dir`` (parquet; idempotent cache).

    Returns a name → path mapping; ``corpus`` may be a directory of part
    files (large specs generate in parallel — every chunk is a pure
    function of (seed, host, j-range), so Ray tasks write parts
    independently and deterministically). A `_SPEC` marker makes the
    cache safe to reuse across bench runs with the same parameters.
    """
    marker = os.path.join(out_dir, "_SPEC")
    want = f"{repr(spec)}//gen=v{_GENERATOR_VERSION}"
    big = spec.n_docs >= _PARALLEL_THRESHOLD
    corpus_path = os.path.join(out_dir, "corpus" if big else "corpus.parquet")
    paths = {
        "corpus": corpus_path,
        "hosts": os.path.join(out_dir, "hosts.parquet"),
        "seeds": os.path.join(out_dir, "seeds.parquet"),
    }
    if os.path.exists(marker) and open(marker).read() == want and all(
        os.path.exists(p) for p in paths.values()
    ):
        return paths
    os.makedirs(out_dir, exist_ok=True)
    if not big:
        tables = generate(spec)
        for name, path in paths.items():
            pq.write_table(tables[name], path)
    else:
        import ray

        if not ray.is_initialized():  # scripts may call outside a session
            ray.init(address="local", include_dashboard=False, logging_level="ERROR")

        @ray.remote
        def gen_part(unit, idx):
            t = _chunk_table(spec, unit)
            os.makedirs(corpus_path, exist_ok=True)
            pq.write_table(t, os.path.join(corpus_path, f"part-{idx:05d}.parquet"))
            return t.num_rows

        units = list(_chunks_of(spec))
        ray.get([gen_part.remote(u, i) for i, u in enumerate(units)])
        small = generate(CorpusSpec(**{**spec.__dict__, "n_docs": spec.n_hosts * 4}))
        pq.write_table(small["hosts"], paths["hosts"])
        # hosts/seeds depend only on n_hosts/n_seeds — regenerate cheaply
        pq.write_table(small["seeds"], paths["seeds"])
    with open(marker, "w") as f:
        f.write(want)
    return paths
