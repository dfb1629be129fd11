#!/usr/bin/env python
"""Microphone-to-speaker pipe (``examples/audiopipe/main.rs:5-8`` analog).

With the ``sounddevice`` package and real audio hardware this pipes the
default input device to the default output; without them it demonstrates
the same two-block pipeline on the loopback driver.
"""

import asyncio
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from radiorust_tpu.runtime.io import (AudioPlayer, AudioRecorder,
                                      LoopbackAudioDriver,
                                      SounddeviceAudioDriver)


async def main():
    try:
        driver = SounddeviceAudioDriver(48000.0)
        print("using sounddevice (real audio hardware)")
    except ImportError:
        driver = LoopbackAudioDriver(48000.0)
        print("sounddevice not installed; using in-process loopback")

    recorder = AudioRecorder(driver, chunk_len=4096)
    player = AudioPlayer(driver)
    player.feed_from(recorder)          # the whole app, like the reference

    if isinstance(driver, LoopbackAudioDriver):
        # Seed the loopback with a tone so the pipe has something to carry.
        t = np.arange(4096) / 48000.0
        driver.play(np.sin(2 * np.pi * 440.0 * t).astype(np.float32))
        await asyncio.sleep(0.5)
        print(f"piped {len(driver.played)} chunks through recorder->player")
    else:  # pragma: no cover - real hardware
        await asyncio.sleep(30.0)


if __name__ == "__main__":
    asyncio.run(main())
