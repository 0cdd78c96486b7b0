"""Front-end tests: G-code → stream byte-equality vs committed
reference-generated goldens, SVG chain round-trips, demo generator, tools."""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

from plotweave.frontends.gcode import gcode_to_stream, parse_polylines_mm
from plotweave.frontends.svg import fit_to_page, parse_path_data, svg_to_polylines
from plotweave.stream import MotionProfile
from plotweave.stream.decoder import StreamDecoder, replay

GOLDEN = Path(__file__).parent / "golden" / "gcode"


def _profile_28():
    # the reference gcode2stream CLI defaults (div_start 28, corner 28/300)
    return MotionProfile()


def test_gcode2stream_byte_equality_speed_scaled():
    text = (GOLDEN / "sample.gcode").read_text()
    data, _ = gcode_to_stream(
        text, invert_y=True, profile=MotionProfile(invert_y=True), speed_scale=1.3
    )
    assert data == (GOLDEN / "ref_g.bin").read_bytes()


def test_gcode2stream_byte_equality_no_reorder():
    text = (GOLDEN / "sample.gcode").read_text()
    data, _ = gcode_to_stream(text, reorder=False, profile=_profile_28())
    assert data == (GOLDEN / "ref_g2.bin").read_bytes()


def test_gcode_parser_features():
    text = (GOLDEN / "sample.gcode").read_text()
    paths, moves = parse_polylines_mm(text)
    # square (abs), triangle legs (rel), Z-inferred diagonal, inch segment
    assert len(paths) == 4
    assert moves == 4 + 3 + 2 + 1
    # inches converted: X7 → 177.8 mm
    assert abs(paths[-1][0][0] - 177.8) < 1e-9


def _fuzz_gcode(rng, allow_stateful=False) -> str:
    """Random G-code exercising the parser's corners: comments (;, (...),
    unclosed parens, stray )), Z pen inference, M3/M4/M5, multiple X per
    line, lowercase words, garbage tokens, missing coords."""
    lines = ["G90", "G21"] if rng.random() < 0.7 else []
    pen_words = ["M3", "M4", "M5", "m3", "m5"]
    for _ in range(int(rng.integers(20, 120))):
        r = rng.random()
        if r < 0.08:
            lines.append(rng.choice(["; comment", "(note)", "G1 (mid) X3 Y4",
                                     "X1 (unclosed Y9", "G1 X2 ) Y3"]))
        elif r < 0.18:
            lines.append(str(rng.choice(pen_words)))
        elif r < 0.26:
            lines.append(f"G1 Z{rng.uniform(-2, 2):.2f}")
        elif r < 0.30:
            lines.append(rng.choice(["FOO", "G", "X", "Xabc Y2", "M X1"]))
        elif allow_stateful and r < 0.36:
            lines.append(rng.choice(["G91", "G90", "G20", "G21"]))
        else:
            parts = ["G1" if rng.random() < 0.5 else "g0"]
            if rng.random() < 0.9:
                parts.append(f"X{rng.uniform(-20, 220):.3f}")
            if rng.random() < 0.9:
                parts.append(f"Y{rng.uniform(-20, 300):.3f}")
            if rng.random() < 0.15:
                parts.append(f"X{rng.uniform(0, 50):.3f}")  # later X wins
            if rng.random() < 0.1:
                parts.append(f"Z{rng.uniform(-1, 1):.2f}")
            if rng.random() < 0.1:
                parts.append("F1200")
            lines.append(" ".join(parts))
    return "\n".join(lines)


def test_fast_parser_matches_exact():
    """The vectorized parser must reproduce the exact state machine's
    geometry and move count on every fuzz document — including the G91
    relative and G20 inch dialects it now models natively."""
    from plotweave.frontends.gcode import (
        _parse_polylines_mm_fast,
        _parse_polylines_mm_py,
    )

    rng = np.random.default_rng(7)
    for trial in range(60):
        text = _fuzz_gcode(rng, allow_stateful=(trial % 3 == 2))
        exact_paths, exact_moves = _parse_polylines_mm_py(text)
        fast = _parse_polylines_mm_fast(text)
        assert fast is not None, text  # finite-valued docs never fall back
        fast_paths, fast_moves = fast
        assert fast_moves == exact_moves, text
        assert len(fast_paths) == len(exact_paths), text
        for fp, ep in zip(fast_paths, exact_paths):
            assert np.array_equal(np.asarray(fp), np.asarray(ep, dtype=np.float64)), text


def _fuzz_gcode_stateful(rng) -> str:
    """Dialect-heavy fuzz: dense G90/G91/G20/G21 switching, including
    mid-line switches (unit state applies at token time, absolute state at
    line end), signed zeros, and repeated X words."""
    lines = []
    for _ in range(int(rng.integers(30, 150))):
        r = rng.random()
        if r < 0.25:
            lines.append(str(rng.choice(["G91", "G90", "G20", "G21", "g91", "g20"])))
        elif r < 0.35:
            # mid-line state switches
            lines.append(str(rng.choice([
                "G20 X1 G21 Y1", "G91 X5 G90 X10", "X2 G20 Y2",
                "G90 G91 X1 Y1", "G21 (c) G20 X0.5", "G91.7 X1", "G20.2 Y3",
            ])))
        elif r < 0.45:
            lines.append(str(rng.choice(["M3", "M5", "m4", "G1 Z-1", "G1 Z1"])))
        elif r < 0.52:
            lines.append(str(rng.choice(["X-0.000", "X-0 Y-0", "G91 X-0.000"])))
        else:
            parts = ["G1"]
            if rng.random() < 0.85:
                parts.append(f"X{rng.uniform(-8, 8):.3f}")
            if rng.random() < 0.85:
                parts.append(f"Y{rng.uniform(-8, 8):.3f}")
            if rng.random() < 0.1:
                parts.append(f"Z{rng.uniform(-1, 1):.2f}")
            lines.append(" ".join(parts))
    return "\n".join(lines)


def test_fast_parser_stateful_dialect_matches_exact():
    """G91 relative accumulation and G20 inch scaling must be bit-identical
    to the exact state machine (incl. -0.0 'or' coercion and token-time
    unit state)."""
    from plotweave.frontends.gcode import (
        _parse_polylines_mm_fast,
        _parse_polylines_mm_py,
    )

    rng = np.random.default_rng(13)
    for _ in range(40):
        text = _fuzz_gcode_stateful(rng)
        exact_paths, exact_moves = _parse_polylines_mm_py(text)
        fast = _parse_polylines_mm_fast(text)
        assert fast is not None, text
        fast_paths, fast_moves = fast
        assert fast_moves == exact_moves, text
        assert len(fast_paths) == len(exact_paths), text
        for fp, ep in zip(fast_paths, exact_paths):
            fa, ea = np.asarray(fp), np.asarray(ep, dtype=np.float64)
            assert fa.shape == ea.shape, text
            # bit-identical, signed zeros included
            assert np.array_equal(fa.view(np.uint64), ea.view(np.uint64)), text


def test_fast_parser_nonfinite_dispatch():
    """Only documents whose G/M/X/Y/Z tokens carry non-finite VALUES fall
    back to the exact parser; nan/inf inside comments or harmless words
    ("INFO") stay on the fast path (regression: the old substring screen
    cost 16x on files with 'info'-style comments)."""
    from plotweave.frontends.gcode import (
        _parse_polylines_mm_fast,
        _parse_polylines_mm_py,
    )

    # these must STAY fast
    for text in [
        "; info: generated by nanotool\nM3\nG1 X10 Y10\nM5",
        "(infinity calibration)\nM3\nG1 X1 Y2",
        "INFO\nM3\nG1 X3 Y4",  # bare word: 'I' command, ignored by both
        "G1 Xnani Y2",          # invalid token, not the nan literal
        "M3\nMnan\nG1 X1 Y1",   # G/M nan literal == ignored token on both
        "Finf\nM3\nG1 X2 Y2",   # F values are never parsed
    ]:
        fast = _parse_polylines_mm_fast(text)
        assert fast is not None, text
        exact_paths, exact_moves = _parse_polylines_mm_py(text)
        assert fast[1] == exact_moves, text
        assert len(fast[0]) == len(exact_paths), text
        for fp, ep in zip(fast[0], exact_paths):
            assert np.array_equal(np.asarray(fp), np.asarray(ep, np.float64)), text

    # these must DISPATCH (non-finite value on a parsed token)
    for text in [
        "M3\nG1 Xnan Y1",       # nan coordinate literal
        "M3\nG1 X-NAN Y1",
        "M3\nG1 Xinf Y1",       # inf coordinate literal
        "M3\nG1 X+Infinity Y1",
        "M3\nG1 X1e999 Y1",     # overflow saturates to inf
        "M3\nZ-inf\nG1 X1 Y1",  # z pen inference on non-finite
        "Znan\nG1 X1 Y1",       # exact sets pen=False from nan<=0
    ]:
        assert _parse_polylines_mm_fast(text) is None, text
    # Ginf raises OverflowError in the exact parser (int(inf)); the fast
    # path must dispatch so the exception surfaces identically
    assert _parse_polylines_mm_fast("Ginf\nG1 X1 Y1") is None
    with pytest.raises(OverflowError):
        _parse_polylines_mm_py("Ginf\nG1 X1 Y1")


def test_fast_parser_line_separator_parity():
    """The exact parser iterates str.splitlines(); the fast parser must see
    the same line structure for every terminator splitlines recognizes
    (regression: '\\r'-separated docs collapsed to one line, so a trailing
    M5 lifted the pen before the move), and documents with literal NULs must
    dispatch to the exact parser."""
    from plotweave.frontends.gcode import (
        _parse_polylines_mm_fast,
        _parse_polylines_mm_py,
    )

    base = ["M3", "G1 X10 Y10", "; comment", "G1 X20 Y5 (mid) Y7", "M5", "G1 X0 Y0"]
    for sep in ["\r", "\r\n", "\f", "\v", "\x85", " ", " "]:
        text = sep.join(base)
        exact_paths, exact_moves = _parse_polylines_mm_py(text)
        fast = _parse_polylines_mm_fast(text)
        assert fast is not None, repr(sep)
        fast_paths, fast_moves = fast
        assert fast_moves == exact_moves == 2, repr(sep)
        assert len(fast_paths) == len(exact_paths) == 1, repr(sep)
        assert np.array_equal(
            np.asarray(fast_paths[0]), np.asarray(exact_paths[0], np.float64)
        ), repr(sep)
    assert _parse_polylines_mm_fast("M3\x00G1 X1 Y1") is None


def test_mm_polylines_to_steps_rejects_non_finite():
    """Garbage-in must raise like the scalar reference's int(round(nan)) —
    not emit INT64_MIN step coordinates."""
    from plotweave.frontends.gcode import mm_polylines_to_steps

    with pytest.raises(ValueError):
        mm_polylines_to_steps(
            [np.array([[0.0, 0.0], [np.nan, 5.0]])], 40.0, 1000, 1000, False
        )


def test_fast_parser_stream_bytes_match_exact():
    """Full gcode→stream bytes through the fast parser == through the exact
    parser (covers mm→steps + ordering + emission over array inputs)."""
    from plotweave.frontends import gcode as G

    rng = np.random.default_rng(11)
    text = _fuzz_gcode(rng)
    prof = MotionProfile(invert_y=True)
    fast_bytes, info = G.gcode_to_stream(text, invert_y=True, profile=prof)

    paths_mm, _ = G._parse_polylines_mm_py(text)
    w = int(round(G.A4_W_MM * 40.0))
    h = int(round(G.A4_H_MM * 40.0))
    steps = G.mm_polylines_to_steps(paths_mm, 40.0, w, h, True)
    data = G.emit_stream(G.order_nearest_l1(steps, (0, 0)), prof, 3)
    assert fast_bytes == data and len(fast_bytes) % 1024 == 0


def test_svg_sampling_backend_jax():
    """--sampling-backend jax routes the Bernstein matmuls through the JAX
    device: same polyline structure, float32-tolerance geometry (the
    documented opt-in divergence; numpy float64 stays the byte contract)."""
    import jax.numpy as jnp

    svg = (
        '<svg xmlns="http://www.w3.org/2000/svg" width="100" height="100">'
        '<path d="M 5 5 C 10 40, 60 40, 80 10 Q 90 0, 95 30 T 99 60"/>'
        '<circle cx="50" cy="50" r="20"/></svg>'
    )
    a = svg_to_polylines(svg)
    b = svg_to_polylines(svg, xp=jnp)
    assert len(a) == len(b)
    for pa, pb in zip(a, b):
        assert pa.shape == pb.shape
        assert np.allclose(pa, pb, rtol=1e-4, atol=1e-3)


def test_svg_path_grammar():
    # closed triangle: Z returns to start
    tri = parse_path_data("M 0 0 L 10 0 L 10 10 Z")[0]
    assert (tri[0] == tri[-1]).all()
    # smooth cubic continuity: S reflects the previous control point
    two = parse_path_data("M0,0 C 0,10 10,10 10,0 S 20,-10 20,0")
    assert len(two) == 1 and len(two[0]) > 10
    # relative quads with T
    q = parse_path_data("m 0 0 q 5 -5 10 0 t 10 0")[0]
    assert abs(q[-1][0] - 20) < 1e-9 and abs(q[-1][1]) < 1e-6
    # arcs land on their endpoint
    a = parse_path_data("M 0 0 A 10 10 0 0 1 20 0")[0]
    assert np.allclose(a[-1], [20, 0], atol=1e-6)


def test_svg_transforms_and_fit():
    svg = (
        '<svg xmlns="http://www.w3.org/2000/svg">'
        '<g transform="translate(5,5) scale(2)"><rect x="0" y="0" width="10" height="10"/></g>'
        "</svg>"
    )
    polys = svg_to_polylines(svg)
    assert len(polys) == 1
    assert np.allclose(polys[0].min(axis=0), [5, 5])
    assert np.allclose(polys[0].max(axis=0), [25, 25])
    fitted = fit_to_page(polys, 210, 297, 10)
    allpts = np.concatenate(fitted)
    assert np.allclose(allpts.min(axis=0), [10, 10])
    assert allpts.max() <= 297 - 10 + 1e-6


def test_svg_to_stream_chain(tmp_path):
    from plotweave.frontends.svg2gcode import convert

    svg = (
        '<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 100 100">'
        '<circle cx="50" cy="50" r="30"/><path d="M10,10 C 30,0 70,0 90,10"/></svg>'
    )
    gcode = convert(svg)
    data, info = gcode_to_stream(gcode, invert_y=True)
    dec = StreamDecoder(data)
    res = replay(dec, *info["canvas_steps"])
    assert dec.stats.eof_seen
    assert dec.stats.off_canvas_steps == 0
    assert len(res.polylines) == info["polylines_steps"] == 2


def test_demo_generator(tmp_path):
    from plotweave.demo.generator import generate_demo

    data = generate_demo(str(tmp_path / "demo.bin"))
    dec = StreamDecoder(data)
    res = replay(dec, 8400, 11880)
    assert dec.stats.eof_seen
    assert dec.stats.taps == 63  # 9×7 tap matrix
    assert dec.stats.off_canvas_steps == 0
    assert len(res.polylines) > 100
    assert json.loads((tmp_path / "demo.json").read_text())["bytes"] == len(data)


def _manifest_fixture_tools():
    import importlib
    import sys as _sys

    tools = str(Path(__file__).parent / "tools")
    if tools not in _sys.path:
        _sys.path.insert(0, tools)
    return importlib.import_module("gen_manifest_creator_golden")


def test_manifest_creator_byte_equality_vs_reference_golden(tmp_path):
    """stream/manifest_creator.py::build must be byte-identical to the
    reference creator (shared/omnirevolve_plotter_stream_creator.py:93-178)
    on the committed oracle golden: layer sort by color index, entry-level
    color fallbacks, (N,1,2) OpenCV contours, clamping, half-even rounding,
    <2-point filtering, taps-only/empty layers, missing-file skip, and the
    explicit initial set_speed byte (creator:126)."""
    from plotweave.stream.manifest_creator import build

    gen = _manifest_fixture_tools()
    golden = Path(__file__).parent / "golden" / "manifest_creator_ref.bin"
    mp = gen.make_fixture(tmp_path / "vec")
    data = build(mp, tmp_path / "out.bin", gen.W_STEPS, gen.H_STEPS, MotionProfile())
    assert data == golden.read_bytes()


@pytest.mark.oracle
def test_manifest_creator_byte_equality_vs_live_reference(tmp_path):
    """Same comparison against the LIVE reference CLI (subprocess), on a
    different seed than the committed golden."""
    from plotweave.stream.manifest_creator import build

    gen = _manifest_fixture_tools()
    if not gen.REF_CREATOR.exists():
        pytest.skip("reference creator not mounted")
    mp = gen.make_fixture(tmp_path / "vec", seed=77)
    ref = gen.run_reference(mp, tmp_path / "ref.bin")
    data = build(mp, tmp_path / "out.bin", gen.W_STEPS, gen.H_STEPS, MotionProfile())
    assert data == ref


def test_manifest_creator(tmp_path):
    import pickle

    from plotweave.stream.manifest_creator import build

    for i, name in enumerate(["a", "b"]):
        (tmp_path / f"layer_{name}.pkl").write_bytes(
            pickle.dumps(
                {
                    "color_name": name,
                    "color_idx": 1 - i,
                    "contours": [{"points": np.array([[100, 100], [500, 400]], np.int32)}],
                    "taps": [{"x": 600 + i, "y": 700}],
                }
            )
        )
    (tmp_path / "manifest.json").write_text(
        json.dumps(
            {
                "image_size": [8400, 11880],
                "layers": [
                    {"file": f"layer_{n}.pkl", "color_name": n, "color_index": i}
                    for i, n in enumerate(["a", "b"])
                ],
            }
        )
    )
    data = build(tmp_path / "manifest.json", tmp_path / "s.bin", 8400, 11880, MotionProfile())
    dec = StreamDecoder(data)
    res = replay(dec, 8400, 11880)
    # layers sorted by color_idx: 'b'(0) before 'a'(1); initial speed byte set
    assert res.colors == [0, 1]
    assert data[1] == 0x40 | 28
    assert dec.stats.taps == 2


def test_tools_palette_and_analysis():
    from plotweave.tools.palette import MarkerPalette

    pal = MarkerPalette()
    m, d = pal.nearest((250, 10, 10))
    assert m.name in ("red", "dark red")
    recs = pal.recommend(
        np.array([[250, 10, 10], [240, 20, 20], [10, 10, 200]]),
        np.array([0.5, 0.3, 0.2]),
        n=3,
    )
    names = [m.name for m, _ in recs]
    assert len(names) == len(set(names))  # dedup suppressed the near-duplicate red


def test_native_tokenizer_matches_regex():
    """The C tokenizer (native/encoder.cpp pw_gcode_tokens) must reproduce
    the regex+float() tokenizer token-for-token: same command masks, same
    values (CPython float grammar: underscores between digits, no hex),
    same line ids — across comment forms, malformed numerics and junk
    tokens.  Non-ASCII documents must dispatch to the regex path (None);
    non-finite G/M/X/Y/Z values must return the exact-parser marker."""
    from plotweave.frontends.gcode import _tokenize_native, _tokenize_regex

    if _tokenize_native("G1 X1") is None:
        import pytest

        pytest.skip("native library unavailable")

    nasty_tokens = [
        "X1_0", "X1__0", "X_1", "X1_", "X1_.5", "X5._2", "X.5", "X5.",
        "X.", "X+", "X-", "X+5", "X-0.25", "X1e5", "X1E+5", "X1e", "X1e+",
        "X1e1_0", "X0x10", "X00.50", "Xabc", "X1.2.3", "X--1", "X+-1",
        "Y,3", "G01", "g1", "m03", "z-0.0", "F12_00", "*junk*", "1garbage",
    ]
    rng = np.random.default_rng(23)
    for trial in range(40):
        lines = []
        for _ in range(int(rng.integers(5, 40))):
            r = rng.random()
            if r < 0.25:
                lines.append(" ".join(
                    str(rng.choice(nasty_tokens))
                    for _ in range(int(rng.integers(1, 5)))))
            elif r < 0.4:
                lines.append(rng.choice([
                    "", "   ", "\t", "; only comment", "(only)", "(unclosed",
                    ") stray", "X(mid)5 Y2", "G1 (a(b) X3", "X1;Y2", "(a;b)c",
                ]))
            else:
                lines.append(
                    f"G1 X{rng.uniform(-9, 9):.4f}\tY{rng.uniform(-9, 9):.4f}")
        sep = str(rng.choice(["\n", "\r\n", "\r"]))
        text = "\n".join(sep.join(lines).splitlines())  # normalized form
        nat = _tokenize_native(text)
        reg = _tokenize_regex(text)
        assert (nat is None) == (reg is None), text
        if nat is None:
            continue
        for i in range(5):  # is_g/m/x/y/z masks
            assert np.array_equal(np.asarray(nat[i]), np.asarray(reg[i])), text
        nv, rv = np.asarray(nat[5]), np.asarray(reg[5])
        assert ((nv == rv) | (np.isnan(nv) & np.isnan(rv))).all(), text
        assert np.array_equal(np.asarray(nat[6]), np.asarray(reg[6])), text
        assert nat[7] == reg[7], text

    # dispatch gates: non-ASCII text → regex path; non-finite values on
    # parsed tokens → exact parser (float("1e999") saturates to inf in
    # CPython — it does NOT raise — and inf coordinates belong to the
    # exact parser's semantics)
    from plotweave.frontends.gcode import _NEEDS_EXACT

    assert _tokenize_native("G1 X1  Y2") is None
    assert _tokenize_native("G1 X1e999") is _NEEDS_EXACT
    assert _tokenize_regex("G1 X1e999") is _NEEDS_EXACT
    assert _tokenize_native("G1 X1 \x00Y2") is None


def test_native_tokenizer_gates_ascii_separators():
    """ASCII \\x1f (unit separator) is regex-\\s whitespace for str patterns
    but is NOT a str.splitlines() boundary, so it survives normalization —
    the native tokenizer must dispatch such documents to the regex path
    (regression: 'X1\\x1fY2' lost the Y2 token)."""
    from plotweave.frontends.gcode import (
        _parse_polylines_mm_fast,
        _parse_polylines_mm_py,
        _tokenize_native,
    )

    text = "M3\nG1 X1\x1fY2\nM5"
    assert _tokenize_native("\n".join(text.splitlines())) is None
    fast = _parse_polylines_mm_fast(text)
    exact_paths, exact_moves = _parse_polylines_mm_py(text)
    assert fast is not None
    assert fast[1] == exact_moves == 1
    assert np.array_equal(np.asarray(fast[0][0]),
                          np.asarray(exact_paths[0], dtype=np.float64))


def test_native_tokenizer_float_grammar_fuzz():
    """Randomized numeric strings over float()'s alphabet (digits, '_',
    '.', signs, exponents) — the C grammar must accept/reject and parse
    every one exactly like CPython float(): same NaN-vs-value decision,
    bit-identical doubles."""
    from plotweave.frontends.gcode import (
        _NEEDS_EXACT,
        _tokenize_native,
        _tokenize_regex,
    )

    if _tokenize_native("G1 X1") is None:
        import pytest

        pytest.skip("native library unavailable")

    rng = np.random.default_rng(41)
    alphabet = list("0123456789" * 3 + "._+-eE")
    for _ in range(25):
        toks = []
        for _ in range(120):
            n = int(rng.integers(1, 13))
            body = "".join(str(rng.choice(alphabet)) for _ in range(n))
            if "inf" in body.lower() or "nan" in body.lower():
                continue  # pre-screened before tokenization in production
            toks.append("X" + body)
        text = "\n".join(" ".join(toks[i : i + 6]) for i in range(0, len(toks), 6))
        nat = _tokenize_native(text)
        if nat is _NEEDS_EXACT:
            # only legitimate cause here: a value saturating to +-inf
            # (CPython float("1e999") returns inf — it does not raise);
            # the regex tokenizer must agree on the dispatch
            has_inf = False
            for t in toks:
                try:
                    has_inf |= bool(np.isinf(float(t[1:])))
                except ValueError:
                    continue  # invalid token → NaN, not a dispatch cause
            assert has_inf, text
            assert _tokenize_regex(text) is _NEEDS_EXACT, text
            continue
        assert nat is not None, text
        reg = _tokenize_regex(text)
        nv, rv = np.asarray(nat[5]), np.asarray(reg[5])
        same = (nv == rv) | (np.isnan(nv) & np.isnan(rv))
        assert same.all(), [
            (t, a, b) for t, a, b in zip(toks, nv, rv) if not (
                a == b or (np.isnan(a) and np.isnan(b)))]
        assert np.array_equal(np.asarray(nat[6]), np.asarray(reg[6]))


def test_native_order_l1_matches_python():
    """pw_order_l1 must reproduce the numpy greedy ordering exactly,
    including first-index tie-breaks (duplicate start points)."""
    from plotweave.native.api import order_l1_native

    if order_l1_native(np.zeros((1, 2), np.int64),
                       np.zeros((1, 2), np.int64), 0, 0) is None:
        import pytest

        pytest.skip("native library unavailable")

    rng = np.random.default_rng(5)
    for _ in range(30):
        n = int(rng.integers(1, 60))
        # small coordinate range to force plenty of exact ties
        starts = rng.integers(0, 7, (n, 2)).astype(np.int64)
        ends = rng.integers(0, 7, (n, 2)).astype(np.int64)
        order = order_l1_native(starts, ends, 0, 0)
        # reference scan (the Python fallback's semantics, inlined)
        alive = list(range(n))
        cur = np.zeros(2, np.int64)
        expect = []
        while alive:
            d = np.abs(starts[alive] - cur).sum(axis=1)
            i = alive.pop(int(np.argmin(d)))
            expect.append(i)
            cur = ends[i]
        assert order.tolist() == expect, (starts.tolist(), ends.tolist())


def test_polylines_to_gcode_matches_scalar_loop():
    """The vectorized G-code text builder must be byte-identical to the
    per-vertex scalar loop it replaced ("%.Nf" % x and f"{x:.Nf}" share
    PyOS_double_to_string), across dtypes and half-even rounding cases."""
    from plotweave.frontends.svg import polylines_to_gcode

    def scalar(polylines, decimals=3):
        lines = ["G21", "G90", "M5"]
        f = f"{{:.{decimals}f}}"
        for p in polylines:
            if len(p) < 2:
                continue
            lines.append(f"G0 X{f.format(p[0, 0])} Y{f.format(p[0, 1])}")
            lines.append("M3")
            for x, y in p[1:]:
                lines.append(f"G1 X{f.format(x)} Y{f.format(y)}")
            lines.append("M5")
        return "\n".join(lines) + "\n"

    rng = np.random.default_rng(9)
    polys = []
    for i in range(50):
        n = int(rng.integers(1, 40))  # includes len-1 (skipped) cases
        p = rng.uniform(-200, 300, (n, 2))
        if i % 3 == 1:
            p = p.astype(np.float32)
        elif i % 3 == 2:
            p = np.round(p).astype(np.int64)
        polys.append(p)
    # exact-binary half-even ties at 3 decimals (0.0625 -> "0.062")
    polys.append(np.array([[0.0625, -0.0625], [2.5, -0.0], [0.5, 1.1875]]))
    for dec in (3, 4):
        assert polylines_to_gcode(polys, dec) == scalar(polys, dec)
    assert polylines_to_gcode([], 3) == scalar([], 3)
    assert polylines_to_gcode([np.zeros((1, 2))], 3) == scalar([np.zeros((1, 2))], 3)


def test_polylines_to_gcode_native_matches_numpy_and_formatter_ties():
    """The native text renderer must equal the numpy fallback byte-for-byte
    (same documents), and glibc snprintf "%.Nf" must equal Python's
    formatter on exact binary-fraction decimal ties."""
    from plotweave.frontends import svg as S
    from plotweave.native.api import gcode_text_native

    rng = np.random.default_rng(17)
    polys = [rng.uniform(-300, 300, (int(rng.integers(2, 50)), 2))
             for _ in range(40)]
    # exact binary fractions: many land exactly on a 3/4-decimal tie
    polys.append((rng.integers(-64000, 64000, (500, 2)) / np.float64(16.0)))
    polys.append((rng.integers(-800000, 800000, (500, 2)) / np.float64(8000.0)))

    native_doc = S.polylines_to_gcode(polys, 3)
    if gcode_text_native(np.zeros((1, 2)), np.zeros(1, bool),
                         np.ones(1, bool), 3) is None:
        import pytest

        pytest.skip("native library unavailable")

    import unittest.mock as mock

    with mock.patch("plotweave.native.api.gcode_text_native",
                    return_value=None):
        numpy_doc = S.polylines_to_gcode(polys, 3)
    assert native_doc == numpy_doc

    # scalar formatter parity on the tie values themselves
    vals = np.concatenate([p.ravel() for p in polys[-2:]])
    body = gcode_text_native(
        vals.reshape(-1, 2),
        np.zeros(len(vals) // 2, bool),
        np.zeros(len(vals) // 2, bool),
        3,
    )
    expect = "".join(
        f"G1 X{x:.3f} Y{y:.3f}\n" for x, y in vals.reshape(-1, 2)
    )
    assert body == expect
