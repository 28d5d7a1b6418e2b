"""Library embedding example: push frames, get events.

The reference documents this usage in its emulator __main__
(/root/reference/v2ecore/emulator.py:1127-1196): construct an emulator,
feed luma frames with timestamps, receive AER arrays.  Same API here, plus
the chunked fast path.

Usage: python examples/library_embedding.py [video.avi]
"""
import os
import sys

import numpy as np

# runnable without installation: repo root onto the path
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    from v2e_tpu import EventEmulator

    emulator = EventEmulator(
        pos_thres=0.2,
        neg_thres=0.2,
        sigma_thres=0.03,
        cutoff_hz=200,
        leak_rate_hz=1,
        shot_noise_rate_hz=10,
        seed=42,
    )

    if len(sys.argv) > 1:
        import cv2

        cap = cv2.VideoCapture(sys.argv[1])
        fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
        frames = []
        while len(frames) < 100:
            ret, fr = cap.read()
            if not ret:
                break
            frames.append(cv2.cvtColor(fr, cv2.COLOR_BGR2GRAY))
        cap.release()
        frames = np.stack(frames)
    else:
        # synthetic fallback: a drifting gradient
        fps = 30.0
        yy, xx = np.mgrid[0:120, 0:160].astype(np.float32)
        frames = np.stack(
            [np.clip(100 + 50 * np.sin((xx + 3 * i) / 19), 0, 255) for i in range(60)]
        ).astype(np.uint8)

    dt = 1.0 / fps

    # frame-at-a-time (reference-style)
    for i in range(5):
        events = emulator.generate_events(frames[i].astype(np.float32), i * dt)
        n = 0 if events is None else events.shape[0]
        print(f"frame {i}: {n} events")

    # chunked fast path: the rest in one device program
    rest = frames[5:]
    times = (5 + np.arange(len(rest))) * dt
    events = emulator.generate_events_batch(rest, times)
    n = 0 if events is None else events.shape[0]
    print(f"chunk of {len(rest)} frames: {n} events")
    print(
        f"totals: {emulator.num_events_total} events "
        f"({emulator.num_events_on} on / {emulator.num_events_off} off)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
