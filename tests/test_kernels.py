"""Unit tests for the pure similarity / phonetic / normalization kernels.

Where DuckDB has an equivalent built-in (levenshtein, jaro_winkler_similarity,
jaccard, list_cosine_similarity) we property-test against it — the same oracle
the driver uses for query verification.
"""

import random
import string

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from mdm_ray import phonetic, simfuncs, simhash, textnorm
from mdm_ray.minhash import MinHasher, minhash_jaccard_estimate


def _rand_strings(n, maxlen=20, alphabet=string.ascii_uppercase + " ", seed=7):
    rng = random.Random(seed)
    return ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, maxlen))) for _ in range(n)]


# ---- textnorm ----------------------------------------------------------------

def test_clean_name():
    arr = pa.array(["  John O'Brien-3rd ", "ALICE", None, "a1b2"])
    out = textnorm.clean_name(arr).to_pylist()
    assert out == ["JOHN OBRIENRD", "ALICE", None, "AB"]


def test_clean_email_phone():
    assert textnorm.clean_email(pa.array([" Bob@X.COM "])).to_pylist() == ["bob@x.com"]
    assert textnorm.clean_phone(pa.array(["(555) 123-4567", None])).to_pylist() == ["5551234567", None]


def test_clean_address_abbrev():
    arr = pa.array(["123 Main Street", "9 Oak Avenue Apt 2", "5 Streetwise Road"])
    out = textnorm.clean_address(arr).to_pylist()
    # word-boundary only: STREETWISE must not be rewritten
    assert out == ["123 MAIN ST", "9 OAK AVE APT 2", "5 STREETWISE RD"]


def test_standardize_table_nullify():
    t = pa.table({"full_name": ["Jo", ""], "email": ["A@B.c", None]})
    out = textnorm.standardize_table(t)
    assert out["full_name_clean"].to_pylist() == ["JO", None]
    assert out["email_clean"].to_pylist() == ["a@b.c", None]


def test_standardize_first_last_name():
    """TRIM(UPPER(x)) parity — bigquery_utils.py:100-101: unlike
    full_name_clean, first/last keep non-alpha characters."""
    t = pa.table(
        {
            "first_name": [" mary-jo ", None, ""],
            "last_name": ["o'neil 3rd", "X", None],
        }
    )
    out = textnorm.standardize_table(t)
    assert out["first_name_clean"].to_pylist() == ["MARY-JO", None, None]
    assert out["last_name_clean"].to_pylist() == ["O'NEIL 3RD", "X", None]


# ---- phonetic ----------------------------------------------------------------

@pytest.mark.parametrize(
    "name,code",
    [
        ("Robert", "R163"),
        ("Rupert", "R163"),
        ("Ashcraft", "A261"),   # H/W transparency
        ("Ashcroft", "A261"),
        ("Tymczak", "T522"),
        ("Pfister", "P236"),
        ("Honeyman", "H555"),
        ("", ""),
        (None, ""),
    ],
)
def test_soundex_known(name, code):
    assert phonetic.soundex(name) == code


def test_soundex_nickname_collision():
    assert phonetic.soundex("JOHN SMITH") == phonetic.soundex("JON SMITH")


def test_metaphone_basics():
    assert phonetic.metaphone("Smith") == phonetic.metaphone("Smyth") == "SM0"
    assert phonetic.metaphone("Knight").startswith("N")
    assert phonetic.metaphone("Xavier")[0] == "S"
    assert phonetic.metaphone("") == ""


# ---- levenshtein / edit similarity -------------------------------------------

def test_levenshtein_vs_duckdb():
    a = _rand_strings(300, seed=1)
    b = _rand_strings(300, seed=2)
    ours = simfuncs.levenshtein_batch(a, b)
    con = duckdb.connect()
    theirs = [
        con.execute("select levenshtein(?, ?)", [x, y]).fetchone()[0]
        for x, y in zip(a, b)
    ]
    assert ours.tolist() == theirs


def test_myers_matches_dp():
    """The bit-parallel Myers kernel must equal the row-DP sweep on mixed
    lengths (0..70, truncation at 64), unicode, None/empty, and repeats."""
    rng = random.Random(99)
    alpha = string.ascii_letters + " é€0123"
    a = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(0, 70)))
        for _ in range(4000)
    ] + [None, "", "a" * 64, "a" * 70, "abc"]
    b = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(0, 70)))
        for _ in range(4000)
    ] + ["", None, "b" * 64, "a" * 70, "abc"]
    fast = simfuncs.levenshtein_batch(a, b)
    slow = simfuncs._levenshtein_dp_batch(a, b, 64)
    assert (fast == slow).all()


def test_edit_similarity_semantics():
    # SQL: 1 - dist/GREATEST(len), NULL-guarded to 0.0
    out = simfuncs.edit_similarity_batch(["KITTEN", None, "AB"], ["SITTING", "X", ""])
    assert out[1] == 0.0 and out[2] == 0.0
    assert abs(out[0] - (1 - 3 / 7)) < 1e-12


def test_token_overlap():
    # duplicates on a's side counted; max of token counts in denominator
    assert simfuncs.token_overlap("A B A", "A C") == 2 / 3
    assert simfuncs.token_overlap("A B", "B A X") == 2 / 3
    assert simfuncs.token_overlap(None, "A") == 0.0


# ---- jaro-winkler ------------------------------------------------------------

def test_jaro_winkler_vs_duckdb():
    a = _rand_strings(300, maxlen=12, seed=3)
    b = _rand_strings(300, maxlen=12, seed=4)
    # include classic pairs
    a += ["MARTHA", "DWAYNE", "DIXON"]
    b += ["MARHTA", "DUANE", "DICKSONX"]
    con = duckdb.connect()
    for x, y in zip(a, b):
        theirs = con.execute("select jaro_winkler_similarity(?, ?)", [x, y]).fetchone()[0]
        assert abs(simfuncs.jaro_winkler(x, y) - theirs) < 1e-9, (x, y)


def test_char_jaccard_vs_duckdb():
    a = _rand_strings(200, seed=5)
    b = _rand_strings(200, seed=6)
    con = duckdb.connect()
    for x, y in zip(a, b):
        if not x or not y:
            continue  # DuckDB jaccard raises on empty input; we define 0.0
        theirs = con.execute("select jaccard(?, ?)", [x, y]).fetchone()[0]
        ours = simfuncs.ngram_jaccard(x, y, 1)
        assert abs(ours - theirs) < 1e-9, (x, y)


# ---- cosine ------------------------------------------------------------------

def test_cosine_batch():
    u = np.array([[1.0, 0.0], [1.0, 2.0], [0.0, 0.0]])
    v = np.array([[0.0, 1.0], [2.0, 4.0], [1.0, 1.0]])
    out = simfuncs.cosine_batch(u, v)
    assert abs(out[0]) < 1e-12
    assert abs(out[1] - 1.0) < 1e-12
    assert out[2] == 0.0


# ---- minhash / simhash -------------------------------------------------------

def test_minhash_estimates_jaccard():
    mh = MinHasher(num_perm=128, shingle_k=3, bands=16)
    s1 = "the quick brown fox jumps over the lazy dog"
    s2 = "the quick brown fox jumped over the lazy dog"
    est = minhash_jaccard_estimate(mh.signature(s1), mh.signature(s2))
    true_j = simfuncs.ngram_jaccard(s1, s2, 3) if False else None
    g1 = {s1[i:i + 3] for i in range(len(s1) - 2)}
    g2 = {s2[i:i + 3] for i in range(len(s2) - 2)}
    true = len(g1 & g2) / len(g1 | g2)
    assert abs(est - true) < 0.15


def test_minhash_lsh_bands_collide_for_near_dupes():
    mh = MinHasher(num_perm=64, shingle_k=3, bands=16)
    k1 = set(mh.band_keys(mh.signature("JOHN SMITH 123 MAIN ST SPRINGFIELD")))
    k2 = set(mh.band_keys(mh.signature("JON SMITH 123 MAIN ST SPRINGFIELD")))
    k3 = set(mh.band_keys(mh.signature("COMPLETELY DIFFERENT PERSON ELSEWHERE")))
    assert k1 & k2
    assert not (k1 & k3)
    assert mh.band_keys(mh.signature("")) == []


def test_minhash_deterministic():
    a = MinHasher(num_perm=64).signature("hello world")
    b = MinHasher(num_perm=64).signature("hello world")
    assert (a == b).all()


def test_simhash_near_dup():
    f1 = simhash.simhash64("the quick brown fox jumps over the lazy dog")
    f2 = simhash.simhash64("the quick brown fox jumps over the lazy cat")
    f3 = simhash.simhash64("completely unrelated text about databases")
    h12 = simhash.hamming64(f1, f2)
    assert h12 < simhash.hamming64(f1, f3)
    # pigeonhole guarantee: with bands > hamming distance, at least one band
    # is identical — the recall property simhash_dedup relies on
    bands = h12 + 1
    assert set(simhash.band_keys(f1, bands)) & set(simhash.band_keys(f2, bands))


def test_escape_salt_namespace():
    from mdm_ray.blocking import escape_salt_namespace

    # keys ending in the reserved '#<int>_<int>' salt suffix are escaped out
    # of the namespace; everything else passes through unchanged
    assert escape_salt_namespace("x_tag:A#1_2") == "x_tag:A#1_2#esc"
    assert escape_salt_namespace("x_tag:A#12_345") == "x_tag:A#12_345#esc"
    assert escape_salt_namespace("x_tag:A") == "x_tag:A"
    assert escape_salt_namespace("x#a_b") == "x#a_b"
    assert escape_salt_namespace("x#1_2_3") == "x#1_2_3"  # two underscores
    # escaped keys are no longer parsed as salted by the pair emitter
    from mdm_ray.pairs import _emit_group
    import numpy as np

    ii, jj, base = _emit_group(None, "x_tag:A#1_2#esc", 0, 3)
    assert base == "x_tag:A#1_2#esc"
    assert len(ii) == 3  # full triangular pairing, not chunk-filtered

    # escape is INJECTIVE on the salt namespace: a literal caller key equal to
    # an escaped form is escaped again, so two distinct groups never merge
    assert escape_salt_namespace("a#1_2#esc") == "a#1_2#esc#esc"
    assert escape_salt_namespace("a#1_2#esc#esc") == "a#1_2#esc#esc#esc"

    # the pair emitter's salt parser accepts ONLY '#<digits>_<digits>' — the
    # int()-parseable shapes the escape leaves alone must pair as plain keys,
    # not be chunk-filtered to zero pairs (or TypeError on chunks=None)
    for weird in ["x#+1_2", "x# 1_2", "x#-1_2"]:
        assert escape_salt_namespace(weird) == weird
        ii, jj, base = _emit_group(None, weird, 0, 3)
        assert base == weird and len(ii) == 3


def test_exchange_fanout_scales_with_rows():
    """Pair-exchange fan-out tracks the exploded row count within
    [1×CPU(≥8), 8×CPU(≥16)] — the round-4 fix for small catalog inputs
    paying 8×-CPU sort exchanges."""
    import os

    from mdm_ray.dsutil import EXCHANGE_ROWS_PER_TASK, default_parallelism, exchange_fanout

    cap = default_parallelism(multiplier=8)
    lo = default_parallelism(multiplier=1, lo=8)
    assert exchange_fanout(None) == cap          # unknown rows: straggler bound
    assert exchange_fanout(0) == lo              # empty input: floor
    assert exchange_fanout(1) == lo
    # mid-size: ceil(rows / rows_per_task), between the clamps
    rows = (lo + 3) * EXCHANGE_ROWS_PER_TASK
    if lo + 3 <= cap:
        assert exchange_fanout(rows) == lo + 3
    assert exchange_fanout(10**12) == cap        # huge input: capped
    # monotone in rows
    vals = [exchange_fanout(r) for r in (0, 10_000, 100_000, 10**7, 10**12)]
    assert vals == sorted(vals)


# ---- pure-NumPy media codecs (BMP / PPM / WAV) --------------------------------

def test_bmp_roundtrip_odd_width():
    from mdm_ray import codecs

    # odd widths exercise the 4-byte row padding
    for h, w in [(1, 1), (3, 5), (16, 16), (7, 2)]:
        rgb = codecs.synth_rgb(f"seed{h}x{w}", h, w)
        assert codecs.sniff_format(codecs.encode_bmp(rgb)) == "bmp"
        out = codecs.decode_bmp(codecs.encode_bmp(rgb))
        assert (out == rgb).all() and out.shape == (h, w, 3)


def test_ppm_roundtrip():
    from mdm_ray import codecs

    rgb = codecs.synth_rgb("ppm-seed", 9, 4)
    data = codecs.encode_ppm(rgb)
    assert codecs.sniff_format(data) == "ppm"
    assert (codecs.decode_ppm(data) == rgb).all()


def test_ppm_header_comment():
    from mdm_ray import codecs
    import numpy as np

    rgb = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    data = b"P6\n# a comment\n3 2\n255\n" + rgb.tobytes()
    assert (codecs.decode_ppm(data) == rgb).all()


def test_wav_roundtrip_and_features():
    from mdm_ray import codecs
    import numpy as np

    pcm = codecs.synth_pcm("wav-seed", n=800, sample_rate=8000)
    data = codecs.encode_wav(pcm, 8000)
    assert codecs.sniff_format(data) == "wav"
    samples, rate = codecs.decode_wav(data)
    assert rate == 8000 and samples.shape == (800, 1)
    assert (samples[:, 0] == pcm).all()
    # stereo roundtrip
    st = np.stack([pcm, -pcm], axis=1).astype(np.int16)
    s2, _ = codecs.decode_wav(codecs.encode_wav(st, 44100))
    assert (s2 == st).all()


def test_decode_rejects_unsupported():
    from mdm_ray import codecs
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        codecs.decode_image(b"\x89PNG\r\n\x1a\n.....")
    with _pytest.raises(ValueError):
        codecs.decode_bmp(b"BM" + b"\x00" * 10)  # truncated header
    with _pytest.raises(ValueError):
        codecs.decode_wav(b"RIFF\x00\x00\x00\x00WAVE")  # no chunks


def test_editsim_index_matches_batch():
    import numpy as np

    from mdm_ray.simfuncs import EditSimIndex, edit_similarity_batch

    rng = np.random.default_rng(7)
    alphabet = list("ABCDEFGH ")
    strings = [
        "".join(rng.choice(alphabet, size=rng.integers(0, 20)))
        for _ in range(60)
    ] + [None, "", "A" * 80, "A" * 79 + "B"]
    n = len(strings)
    ii = rng.integers(0, n, size=500)
    jj = rng.integers(0, n, size=500)
    exact = edit_similarity_batch(
        [strings[i] for i in ii], [strings[j] for j in jj]
    )
    got = EditSimIndex(strings).similarity(ii, jj, prune_below=0.6)
    # consumer contract: identical after the > cutoff threshold
    assert np.array_equal(
        np.where(got > 0.6, got, 0.0), np.where(exact > 0.6, exact, 0.0)
    )
    # pruned entries must still be valid upper bounds
    assert (got + 1e-12 >= exact).all()
