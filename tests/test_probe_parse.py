"""Probe deck-syntax parsing: tokens, offsets, stems (reference contract)."""

import numpy as np
import pytest

from latticeurbanwind_tpu.run.probe_parse import (
    parse_probe_offset, parse_probe_request, probe_file_stem, split_probe_tokens,
)


def test_split_tokens():
    toks = split_probe_tokens('[121.5:31.2, center, "centre" NNE, 121.6:31.3 N100E50.5]')
    assert toks == ['121.5:31.2', 'center', '"centre" NNE', '121.6:31.3 N100E50.5']


def test_offset_grid_cells():
    off = parse_probe_offset("NNE")
    assert off.mode == "grid" and off.north_cells == 2 and off.east_cells == 1
    off = parse_probe_offset("swW")
    assert off.north_cells == -1 and off.east_cells == -2
    with pytest.raises(ValueError):
        parse_probe_offset("NXE")


def test_offset_meters():
    off = parse_probe_offset("N100E50.5")
    assert off.mode == "meters"
    assert off.north_m == pytest.approx(100.0)
    assert off.east_m == pytest.approx(50.5)
    off = parse_probe_offset("S10W2.5N1")
    assert off.north_m == pytest.approx(-9.0)
    assert off.east_m == pytest.approx(-2.5)
    with pytest.raises(ValueError):
        parse_probe_offset("N100X")


def test_request_variants():
    r = parse_probe_request("121.5:31.25")
    assert (r.lon, r.lat) == (121.5, 31.25) and not r.uses_center
    r = parse_probe_request("center NNE")
    assert r.uses_center and r.offset.north_cells == 2
    r = parse_probe_request('"centre" N50')
    assert r.uses_center and r.offset.north_m == 50.0
    r = parse_probe_request("121.6:31.3 N100E50.5")
    assert r.offset.east_m == 50.5
    with pytest.raises(ValueError):
        parse_probe_request("not-a-probe")


def test_file_stem():
    r = parse_probe_request("121.5:31.25 NNE")
    assert probe_file_stem(r, (0, 0)) == "121.5_31.25_NNE"
    r = parse_probe_request("center")
    assert probe_file_stem(r, (121.0, 31.0), prefix="DG_5_0_") == "DG_5_0_121_31"


def test_standard_mode_with_probes(tmp_path):
    """End-to-end: probes resolved, sampled, and written as CSV columns."""
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from test_standard_mode import _write_synthetic_case

    from latticeurbanwind_tpu.deck import load_deck
    from latticeurbanwind_tpu.run.standard import run_standard_mode

    case = tmp_path / "probe_case"
    _write_synthetic_case(case, with_patch=False, with_T=False, high_order=False)
    deck = load_deck(case / "conf.luw")
    deck.set_text("utm_crs", "EPSG:32651", quoted=True)
    deck.set_float("rotate_deg", 0.0)
    deck.set_raw("probes", "[center, center N1E1, 999:99]")
    deck.set_int("probes_output", 10)
    deck.save()
    results = run_standard_mode(case / "conf.luw", quiet=True)
    csvs = [f for f in results[0].files if f.suffix == ".csv"]
    assert len(csvs) == 2   # the out-of-domain probe is dropped
    body = csvs[0].read_text().splitlines()
    assert body[0].startswith("height (m),")
    assert ":" in body[1].split(",")[1]   # u:v:w cells
