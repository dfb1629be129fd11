"""Golden tests for morse, values from ``src/blocks/morse.rs:426-472``."""

import numpy as np

from radiorust_tpu.blocks.morse import (
    EndOfMessages,
    Keyer,
    Speed,
    StartOfMessages,
    Unit,
    encode,
    units_to_envelope,
)

D, A, S = Unit.DIT, Unit.DAH, Unit.SPACE
CS, WS, P = Unit.CHAR_SPACE, Unit.WORD_SPACE, Unit.PADDING


def assert_approx(a, b):
    if abs(a - b) > 1e-10:
        assert a * b > 0.0, f"{a} !~ {b}"
        assert abs(np.log(abs(a)) - np.log(abs(b))) <= 1e-10, f"{a} !~ {b}"


def test_morse_speed_type():
    speed = Speed.from_paris_wpm(16.0)
    assert_approx(speed.paris_wpm(), 16.0)
    assert_approx(speed.codex_wpm(), 13.333333333333)
    assert_approx(Speed.from_codex_wpm(13.333333333333).paris_wpm(), 16.0)
    assert_approx(speed.paris_cpm(), 80.0)
    assert_approx(Speed.from_paris_cpm(80.0).paris_wpm(), 16.0)
    assert_approx(speed.codex_cpm(), 66.666666666667)
    assert_approx(Speed.from_codex_cpm(66.666666666667).paris_wpm(), 16.0)
    assert_approx(speed.dits_per_minute(), 800.0)
    assert_approx(Speed.from_dits_per_minute(800.0).paris_wpm(),
                  speed.paris_wpm())
    assert_approx(speed.seconds_per_dit(), 75e-3)
    assert_approx(speed.samples_per_dit(1.0), 75e-3)
    assert_approx(speed.samples_per_dit(48000.0), 3600.0)
    assert_approx(Unit.DIT.samples(48000.0, speed), 3600.0)
    assert_approx(Unit.DAH.samples(48000.0, speed), 10800.0)
    assert_approx(Unit.CHAR_SPACE.samples(48000.0, speed), 10800.0)
    assert_approx(Unit.WORD_SPACE.samples(48000.0, speed), 25200.0)


def test_encode():
    assert encode("AB C") == [
        P, D, S, A, CS, A, S, D, S, D, S, D, WS, A, S, D, S, A, S, D, P,
    ]


def test_encode_prosign():
    assert encode("<TTTTTT>V <CT> X<AR>") == [
        P, A, S, A, S, A, S, A, S, A, S, A, CS, D, S, D, S, D, S, A, WS,
        A, S, D, S, A, S, D, S, A, WS, A, S, D, S, D, S, A, CS,
        D, S, A, S, D, S, A, S, D, P,
    ]


def test_encode_errors():
    import pytest
    from radiorust_tpu.blocks.morse import EncodeError
    with pytest.raises(EncodeError):
        encode("<<A>")
    with pytest.raises(EncodeError):
        encode(">")
    with pytest.raises(EncodeError):
        encode("<A B>")
    with pytest.raises(EncodeError):
        encode("\x07")
    with pytest.raises(EncodeError):
        encode("ü")


def test_envelope_lengths():
    speed = Speed.from_paris_wpm(16.0)
    env = units_to_envelope(encode("E"), 48000.0, speed)
    # Padding(3.5) + Dit(1) + Padding(3.5) = 8 dits of 3600 samples
    assert len(env) == 3600 * 8
    assert env[: 3600 * 3 + 1800].max() == 0.0
    assert env[3600 * 3 + 1800 + 1] == 1.0


def test_keyer_chunks_and_events():
    speed = Speed.from_dits_per_minute(60.0 * 48000.0 / 64)  # 64 samp/dit
    k = Keyer(chunk_len=128, sample_rate=48000.0, speed=speed, message="E")
    chunks = list(k.chunks(4))
    # First chunk carries StartOfMessages.
    assert any(isinstance(e, StartOfMessages) for e in chunks[0][1])
    # Envelope: 3.5+1+3.5 dits * 64 = 512 samples = 4 chunks of 128.
    env = np.concatenate([c for c, _ in chunks])
    assert env.shape == (512,)
    on = np.flatnonzero(env.real == 1.0)
    assert on.min() == 224 and on.max() == 287  # padding 3.5*64=224, dit 64
    # After drain, silence + EndOfMessages.
    more = list(k.chunks(1))
    assert any(isinstance(e, EndOfMessages) for e in more[0][1])
    assert np.all(more[0][0] == 0)


def test_unit_sample_count_rounds_half_away_from_zero():
    """Rust f64::round semantics on exact .5 ties (src/blocks/morse.rs:
    355-357): samples_per_dit = 312.5 must give a 313-sample DIT, not
    Python banker's 312."""
    from radiorust_tpu.blocks.morse import Speed, Unit, units_to_envelope
    from radiorust_tpu.math import round_half_away

    speed = Speed.from_dits_per_minute(1536.0)   # 60*8000/1536 = 312.5
    assert speed.samples_per_dit(8000.0) == 312.5
    env = units_to_envelope([Unit.DIT], 8000.0, speed)
    assert env.size == 313
    assert round_half_away(-312.5) == -313       # away from zero, both signs
    assert round_half_away(2.5) == 3 and round_half_away(-2.5) == -3
