"""FP16C codec experiment lab (dev tool, not part of the package).

Measures candidate in-kernel fp16c codec formulations against the current
one on the flagship bench kernel, and verifies each candidate bit-exact
against the jnp-tier reference codec (lbm.state.encode/decode_fp16c) over
all 65536 code points (decode) and a dense exponent-band sweep (encode).

Usage:
  python tools/codec_lab.py check            # correctness (any backend)
  python tools/codec_lab.py perf [variants]  # on-chip MLUPs per variant

Variants:
  v0        current production codec (ops/stream_collide._make_codec)
  encbit    v0 decode + bit-trick encode (scale into f32 exponent space,
            round via +0x800 on the raw bits, one denormal select)
  decmagic  magic-subtract decode (no int->float convert on the normal
            path) + bit-trick encode
  probe_dec v0 decode + free (invalid) encode — isolates decode cost
  probe_enc free (invalid) decode + v0 encode — isolates encode cost
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------- variants
def _enc_bit(x):
    """fp32 -> fp16c via exponent-space scaling + raw-bit rounding.

    |x| * 2^-112 puts the fp16c exponent E at the f32 exponent field
    (bits 23..26) and the 11-bit target mantissa at bits 12..22; adding
    0x800 to the raw bits rounds (carry rolls the exponent correctly at
    power-of-two boundaries), >>12 yields the code.  Denormal targets
    (|x| < 2^-14) would make the scaled value an f32 subnormal (flushed
    on TPU), so they take the direct quantization path; one select."""
    a = jnp.abs(x)
    b = jax.lax.bitcast_convert_type(a * np.float32(2.0 ** -112), jnp.int32)
    c = jnp.minimum((b + 0x800) >> 12, 0x7FFF)
    den = (a * np.float32(2.0 ** 25) + 0.5).astype(jnp.int32)
    c = jnp.where(a < np.float32(2.0 ** -14), den, c)
    sgn = (jax.lax.bitcast_convert_type(x, jnp.int32) >> 16) & 0x8000
    return (sgn | c).astype(jnp.uint16)


def _dec_v0(x):
    b = x.astype(jnp.int32)
    e = (b >> 11) & 0xF
    M = (b & 0x7FF) | jnp.where(e != 0, 2048, 0)
    M = jnp.where((b & 0x8000) != 0, -M, M)
    scale = jax.lax.bitcast_convert_type(
        (jnp.maximum(e, 1) + 101) << 23, jnp.float32)
    return M.astype(jnp.float32) * scale


def _enc_v0(x):
    b = jax.lax.bitcast_convert_type(x, jnp.int32)
    e32 = (b >> 23) & 0xFF
    E = jnp.clip(e32 - 112, 1, 15)
    scale = jax.lax.bitcast_convert_type((153 - E) << 23, jnp.float32)
    t = jnp.abs(x) * scale + 0.5
    h = jnp.minimum(t.astype(jnp.int32) + ((E - 1) << 11), 0x7FFF)
    h = jnp.where(e32 > 100, h, 0)
    h = jnp.where(e32 > 127, 0x7FFF, h)
    return ((b >> 16) & 0x8000 | h).astype(jnp.uint16)


def _dec_magic(x):
    """fp16c -> fp32 without the normal-path int->float convert: relocate
    the code's e/m fields into the f32 layout by integer add (no carries:
    m<<12 < 2^23), bitcast; denormals correct via the magic subtract
    (assembled - 2^-15 is m/2048 * 2^-15; x2 gives m * 2^-25)."""
    b = x.astype(jnp.int32)
    bits = ((b & 0x7FFF) << 12) + (112 << 23)
    nrm = jax.lax.bitcast_convert_type(bits, jnp.float32)
    den = (nrm - np.float32(2.0 ** -15)) * 2.0
    v = jnp.where((b & 0x7800) != 0, nrm, den)
    sgnbits = (b & 0x8000) << 16
    return jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(v, jnp.int32) | sgnbits, jnp.float32)


# ------------------------------------------------- f16 (FP16S) variants
def _dec_f16_magic(x):
    """FP16S -> fp32 (value includes the *2^-15 range shift) without the
    normal-path int->float convert: e/m relocate by integer add + bitcast;
    denormal halves via the magic subtract (x2^-15 folded throughout)."""
    b = x.astype(jnp.int32)
    bits = ((b & 0x7FFF) << 13) + (97 << 23)
    nrm = jax.lax.bitcast_convert_type(bits, jnp.float32)
    den = (nrm - np.float32(2.0 ** -30)) * 2.0
    v = jnp.where((b & 0x7C00) != 0, nrm, den)
    sgnbits = (b & 0x8000) << 16
    return jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(v, jnp.int32) | sgnbits, jnp.float32)


def _enc_f16_bit(x):
    """fp32 -> FP16S with IEEE round-to-nearest-even via the raw-bit trick:
    |x|*2^-97 puts the half exponent at the f32 exponent field; adding
    0xFFF + lsb-of-target rounds RNE; >>13 yields the code.  Denormal
    targets (|x| < 2^-29) take the direct RNE quantization path."""
    a = jnp.abs(x)
    b = jax.lax.bitcast_convert_type(a * np.float32(2.0 ** -97), jnp.int32)
    c = jnp.minimum((b + 0xFFF + ((b >> 13) & 1)) >> 13, 0x7BFF)
    den = jax.lax.round(a * np.float32(2.0 ** 39),
                        jax.lax.RoundingMethod.TO_NEAREST_EVEN
                        ).astype(jnp.int32)
    c = jnp.where(a < np.float32(2.0 ** -29), den, c)
    sgn = (jax.lax.bitcast_convert_type(x, jnp.int32) >> 16) & 0x8000
    return (sgn | c).astype(jnp.uint16)


def _dec_f16_native(x):
    """FP16S decode via the HARDWARE f16->f32 convert, if Mosaic lowers it:
    bitcast the stored pattern to IEEE half, convert, apply the 2^-15 range
    shift.  Two ops — same shape as the bf16 codec.  Bit-exactness vs the
    software codec must be verified ON TPU (subnormal-half handling may
    differ from the CPU backend)."""
    h = jax.lax.bitcast_convert_type(x, jnp.float16)
    return h.astype(jnp.float32) * np.float32(2.0 ** -15)


def _enc_f16_native(x):
    """FP16S encode via the hardware f32->f16 convert (native RNE), with
    the software codec's overflow saturation (clamp to the max finite half
    before converting, so the e=31 inf/NaN band is never emitted — which
    is also what makes the 2-op native DECODE safe: no legitimate flow can
    feed it an e=31 pattern)."""
    lim = np.float32(65504.0)
    h = jnp.clip(x * np.float32(2.0 ** 15), -lim, lim).astype(jnp.float16)
    return jax.lax.bitcast_convert_type(h, jnp.uint16)


def _free_dec(x):       # perf probe only: bitcast-ish junk, near-zero cost
    return x.astype(jnp.int32).astype(jnp.float32) * np.float32(2.0 ** -14)


def _free_enc(x):       # perf probe only
    return (jnp.abs(x) * 16384.0).astype(jnp.int32).astype(jnp.uint16)


VARIANTS = {
    # name: (storage, (dec, enc) or None for the production codec)
    "v0": ("fp16c", None),
    "encbit": ("fp16c", (_dec_v0, _enc_bit)),
    "decmagic": ("fp16c", (_dec_magic, _enc_bit)),
    "probe_dec": ("fp16c", (_dec_v0, _free_enc)),
    "probe_enc": ("fp16c", (_free_dec, _enc_v0)),
    "f16_v0": ("f16", None),
    "f16_magic": ("f16", (_dec_f16_magic, _enc_f16_bit)),
    "f16_native": ("f16", (_dec_f16_native, _enc_f16_native)),
}


def _install(name: str):
    """Monkeypatch ops/stream_collide._make_codec for the variant's storage."""
    import latticeurbanwind_tpu.ops.stream_collide as sc

    if not hasattr(sc, "_make_codec_orig"):
        sc._make_codec_orig = sc._make_codec
    target, pair = VARIANTS[name]
    if pair is None:
        sc._make_codec = sc._make_codec_orig
        return target

    def patched(storage):
        if storage == target:
            return pair
        return sc._make_codec_orig(storage)

    sc._make_codec = patched
    return target


# ------------------------------------------------------------ correctness
def check() -> int:
    from latticeurbanwind_tpu.lbm.state import decode_fp16c, encode_fp16c

    codes = np.arange(65536, dtype=np.uint16)
    ref_dec = np.asarray(decode_fp16c(codes))

    # encode sweep: dense coverage of every f32 exponent band in range,
    # plus denormal band, boundaries, overflow, specials
    rng = np.random.default_rng(0)
    vals = []
    for e in range(90, 130):
        vals.append(rng.uniform(1.0, 2.0, 4096).astype(np.float32)
                    * np.float32(2.0 ** (e - 127)))
    # exact rounding ties: midpoints between adjacent codes in every band
    m = np.arange(0, 2048, dtype=np.float64)
    ties = [((m + 0.5) * 2.0 ** -25).astype(np.float32)]          # denormal
    for E in range(1, 16):                                        # normal
        ties.append(((1.0 + (m + 0.5) / 2048.0)
                     * 2.0 ** (E - 15)).astype(np.float32))
    sweep = np.concatenate(vals + ties + [
        np.array([0.0, -0.0, 1.9995, -1.9995, 2.0, -2.0, 65504.0,
                  2.0 ** -14, 2.0 ** -25, 2.0 ** -26, 2.0 ** -27,
                  np.inf, -np.inf], np.float32),
        -np.concatenate(vals + ties),
    ])
    ref_enc = np.asarray(encode_fp16c(sweep))

    rc = 0
    for name, (storage, pair) in VARIANTS.items():
        if name.startswith("probe") or storage != "fp16c" or pair is None:
            continue
        dec, enc = pair
        got_dec = np.asarray(jax.jit(dec)(jnp.asarray(codes)))
        # NaN codes (e=15 is a finite band in fp16c — no NaNs in-format);
        # compare everything bit-for-bit as f32
        dbad = np.flatnonzero(got_dec.view(np.int32) != ref_dec.view(np.int32))
        # -0.0 == 0.0 difference is acceptable (sign of zero from sgn fold)
        dbad = np.array([i for i in dbad
                         if not (got_dec[i] == 0 and ref_dec[i] == 0)])
        got_enc = np.asarray(jax.jit(enc)(jnp.asarray(sweep)))
        ebad = np.flatnonzero(got_enc != ref_enc)
        # reference NaN quirk: jnp-tier saturates NaN to sgn|0x7FFF too, so
        # no exemption needed; report all
        print(f"{name}: decode mismatches {dbad.size}/65536, "
              f"encode mismatches {ebad.size}/{sweep.size}")
        if dbad.size:
            i = int(dbad[0])
            print(f"  first dec: code {i:#06x} got {got_dec[i]!r} "
                  f"want {ref_dec[i]!r}")
            rc = 1
        if ebad.size:
            i = int(ebad[0])
            print(f"  first enc: val {sweep[i]!r} got {got_enc[i]:#06x} "
                  f"want {ref_enc[i]:#06x}")
            rc = 1
    return rc


def check_f16() -> int:
    """f16 variants vs the production kernel codec (which is itself pinned
    to IEEE semantics by the kernel equivalence tests): decode over all
    65536 codes, encode over the dense + tie sweep."""
    import latticeurbanwind_tpu.ops.stream_collide as sc

    dec0, enc0 = sc._make_codec("f16")
    codes = np.arange(65536, dtype=np.uint16)
    ref_dec = np.asarray(jax.jit(dec0)(jnp.asarray(codes)))

    rng = np.random.default_rng(1)
    vals = [rng.uniform(1.0, 2.0, 4096).astype(np.float32)
            * np.float32(2.0 ** (e - 127)) for e in range(85, 125)]
    m = np.arange(0, 1024, dtype=np.float64)
    ties = [((m + 0.5) * 2.0 ** -39).astype(np.float32)]
    for E in range(1, 31):
        ties.append(((1.0 + (m + 0.5) / 1024.0)
                     * 2.0 ** (E - 30)).astype(np.float32))
    sweep = np.concatenate(vals + ties + [
        np.array([0.0, -0.0, 2.0 ** -29, 2.0 ** -30, 2.0 ** 1, 2.0 ** 2,
                  np.inf, -np.inf], np.float32),
        -np.concatenate(vals + ties)])
    ref_enc = np.asarray(jax.jit(enc0)(jnp.asarray(sweep)))

    rc = 0
    for name, (dec, enc) in (("f16_magic", (_dec_f16_magic, _enc_f16_bit)),
                             ("f16_native", (_dec_f16_native,
                                             _enc_f16_native))):
        got_dec = np.asarray(jax.jit(dec)(jnp.asarray(codes)))
        bad = (got_dec.view(np.int32) != ref_dec.view(np.int32)) \
            & ~((got_dec == 0) & (ref_dec == 0))
        if name == "f16_native":
            # decode domain = encodable codes only: the saturating encode
            # (every producer: kernel, jnp tier, host init) never emits the
            # e=31 band, so the 2-op native decode need not match there
            bad &= (codes & 0x7C00) != 0x7C00
        dbad = np.flatnonzero(bad)
        got_enc = np.asarray(jax.jit(enc)(jnp.asarray(sweep)))
        ebad = np.flatnonzero(got_enc != ref_enc)
        print(f"{name}: decode mismatches {dbad.size}/65536, "
              f"encode mismatches {ebad.size}/{sweep.size} "
              f"[backend={jax.default_backend()}]")
        for i in dbad[:3]:
            print(f"  dec code {i:#06x}: got {got_dec[i]!r} "
                  f"want {ref_dec[i]!r}")
        for i in ebad[:3]:
            print(f"  enc val {sweep[i]!r}: got {got_enc[i]:#06x} "
                  f"want {ref_enc[i]:#06x}")
        rc |= 1 if (dbad.size or ebad.size) else 0
    return rc


# ------------------------------------------------------------------- perf
def perf(names) -> int:
    os.environ.setdefault("LUW_BENCH_STEPS", "100")
    os.environ.setdefault("LUW_BENCH_REPS", "2")
    sys.path.insert(0, str(REPO))
    import bench

    shape = bench.parse_shape()
    steps = int(os.environ["LUW_BENCH_STEPS"])
    reps = int(os.environ["LUW_BENCH_REPS"])
    jax.devices()
    for name in names:
        storage = _install(name)
        # fresh trace per variant (make_bench_runner caches nothing global,
        # but jax caches jitted fns by python identity — the patched codec
        # produces new closures, so retraces happen naturally)
        mlups, impl = bench.measure(storage, shape, steps, reps, "auto")
        print(f"{name}: {mlups:.1f} MLUPs ({impl}, {shape})")
    _install("v0")
    return 0


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    if mode == "check":
        sys.exit(check() | check_f16())
    names = sys.argv[2:] or ["v0", "encbit", "decmagic", "probe_dec",
                             "probe_enc", "f16_v0", "f16_magic"]
    sys.exit(perf(names))
