"""Fine-tune the bundled detector with photo-background mixing, evaluate,
and (only if both domains pass floors) replace the bundled weights."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
from video_stab_tpu.utils.cache import compilation_cache_dir
jax.config.update("jax_compilation_cache_dir",
                  compilation_cache_dir(".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import cv2
cv2.setNumThreads(0)

from video_stab_tpu.models.detector import bundled_weights_path
from video_stab_tpu.models.train import evaluate_detector, train_detector

steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
out_path = "video_stab_tpu/models/weights/centernet_traffic_ft.msgpack"
model, params, losses = train_detector(
    n_steps=steps, batch=8, height=192, width=320, use_scenes=True,
    photo_prob=0.5, init_weights=bundled_weights_path(),
    lr=3e-4, save_path=out_path, log_every=25, seed=123)
print("final losses:", [round(l, 3) for l in losses[-5:]], flush=True)
for bg in ("rendered", "photo"):
    m = evaluate_detector(model, params, n_scenes=24, seed=4242,
                          background=bg)
    print(bg, {k: round(v, 3) if isinstance(v, float) else v
               for k, v in m.items()}, flush=True)
