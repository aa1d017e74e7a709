"""Re-measure the reference's BAMPfinal QPSK operating points in place.

The published BAMPfinal QPSK JSONs are 100-trial coarse runs (every FER is
a multiple of 0.01 — binomial sigma ~0.027 at the 8 dB point), too loose to
pin the golden-artifact CI test.  This runs the reference's OWN torch code
(`/root/reference/bamp_model.py:69-98` config, `bamp.py:116-143` decoder)
on CPU at 2000+ trials per point, exactly as was previously done for VAMP
(PARITY.md), and records the tight values in reference_qpsk_golden.json.

Run from /root/repo:  nohup python scripts/remeasure_reference_qpsk.py &
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/reference")

import numpy as np  # noqa: E402
import torch  # noqa: E402

torch.manual_seed(0)
np.random.seed(0)
torch.set_num_threads(2)

from bamp import BAMP  # noqa: E402
from channel import Channel  # noqa: E402
from config import Config  # noqa: E402
from data import Data  # noqa: E402
from loss import Loss  # noqa: E402

# BAMPfinal QPSK config (`bamp_model.py:73-92` grid with the QPSK row used
# for Simulations/BAMPfinal/QPSK,segmented/uniform,tail/
# Nt=128,Na=16,Nr=32,Lh=6,Lin=25).
config = Config(
    N_transmit_antenna=128,
    N_active_antenna=16,
    N_receive_antenna=32,
    block_length=25,
    channel_length=6,
    channel_truncation="tail",
    alphabet="QPSK",
    channel_profile="uniform",
    generator_mode="segmented",
    batch=1,
    iterations=100,
    device="cpu",
)

amp = BAMP(config).to("cpu")
loss = Loss(config)
channel = Channel(config)
data = Data(config)

EPOCHS = 2000
RES = 100  # reference fine sweeps regenerate the channel every 100 trials
OUT = "/root/repo/reference_qpsk_golden.json"

results = {}
if len(sys.argv) > 1:
    POINTS = tuple(float(a) for a in sys.argv[1:])
else:
    POINTS = (8.0, 9.0)
if os.path.exists(OUT):
    results = json.load(open(OUT))["points"]
for ebn0 in POINTS:
    if str(ebn0) in results:
        continue
    snr_db = ebn0 + 10 * np.log10(config.code_rate)
    snr = 10 ** (snr_db / 10)
    t0 = time.time()
    with torch.no_grad():
        for i in range(EPOCHS):
            if i % RES == 0:
                _, A = channel.generate_as_sparc()
            x, s, idx = data.generate_message()
            y = A @ x + channel.awgn(snr)
            out = amp(A, y, snr, x, s, idx)
            loss.accumulate(out)
            if (i + 1) % 100 == 0:
                dt = time.time() - t0
                print(f"{ebn0} dB: {i + 1}/{EPOCHS} trials, {dt:.0f}s "
                      f"({(i + 1) / dt:.2f} trials/s)", flush=True)
    loss.average(EPOCHS)
    results[str(ebn0)] = {k: float(v) for k, v in loss.loss.items()
                          if np.isscalar(v) or hasattr(v, "item")}
    print(f"EbN0={ebn0}: FER={loss.loss['fer']} BER={loss.loss['ber']} "
          f"T={loss.loss['T']}", flush=True)
    # Loss.dump() drops the 'T' key (`loss.py:348-349` resets to a bare
    # dict) which breaks the next accumulate; reset the way export() does.
    loss.loss = {"T": 0}
    with open(OUT, "w") as f:
        json.dump({"epochs": EPOCHS, "res": RES, "points": results}, f,
                  indent=1)
print("wrote", OUT, flush=True)
