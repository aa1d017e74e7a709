"""Re-measure the reference's BAMPfinal OOK waterfall-knee points in place.

The golden T test holds its knee rows at rel=0.20 (bamp_ook@7.0 measured
-13% vs the published 10k-trial JSON).  As for QPSK/8PSK/BPSK/OOK-SCAMP,
this runs the reference's OWN torch BAMP (`/root/reference/bamp.py:116-143`,
`bamp_model.py:69-98` config) on CPU and records tight values in
reference_bamp_ook_golden.json, so knee deviations can be attributed to
channel-ensemble variance vs real divergence.

Usage (from /root/repo):
    python scripts/remeasure_reference_bamp_ook.py 6.0 7.0 8.0
Environment: EPOCHS (default 1000).
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

# Simulations/BAMPfinal/OOK,segmented/uniform,tail/Nt=128,Na=8,Nr=24,
# Lh=3,Lin=20 (the flagship sweep family).
config = Config(N_transmit_antenna=128, N_active_antenna=8,
                N_receive_antenna=24, block_length=20, channel_length=3,
                channel_truncation="tail", alphabet="OOK",
                channel_profile="uniform", generator_mode="segmented",
                batch=1, device="cpu", iterations=100)

amp = BAMP(config).to("cpu")
loss = Loss(config)
channel = Channel(config)
data = Data(config)

EPOCHS = int(os.environ.get("EPOCHS", "1000"))
RES = 100  # reference fine sweeps regenerate the channel every 100 trials
OUT = "/root/repo/reference_bamp_ook_golden.json"

results = {}
POINTS = tuple(float(a) for a in sys.argv[1:]) or (6.0, 7.0, 8.0)
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
                H = channel.generate_channel()
            x, s, idx = data.generate_message()
            y = H @ x + channel.awgn(snr)
            out = amp(H, y, snr, x, s, idx)
            loss.accumulate(out)
            if (i + 1) % 100 == 0:
                dt = time.time() - t0
                print(f"ook {ebn0} dB: {i + 1}/{EPOCHS} trials, "
                      f"{dt:.0f}s ({(i + 1) / dt:.2f} trials/s)",
                      flush=True)
    loss.average(EPOCHS)
    results[str(ebn0)] = {k: float(v) for k, v in loss.loss.items()
                          if np.isscalar(v) or hasattr(v, "item")}
    print(f"ook EbN0={ebn0}: FER={loss.loss['fer']} "
          f"BER={loss.loss['ber']} T={loss.loss['T']}", flush=True)
    loss.loss = {"T": 0}
    with open(OUT, "w") as f:
        json.dump({"epochs": EPOCHS, "res": RES,
                   "cap": config.N_Layers, "points": results}, f, indent=1)
print("wrote", OUT, flush=True)
