# romp_tpu container (parity with the reference's Dockerfile smoke test:
# install the package and run a CLI end-to-end during build).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ libgl1 libglib2.0-0 && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY . /app
RUN pip install --no-cache-dir "jax[cpu]" optax opencv-python-headless \
    scipy pyyaml && pip install --no-cache-dir -e .

# Build-time smoke test: synthetic image through the full ROMP pipeline
# (random weights + synthetic SMPL assets; exercises preprocess -> net ->
# parse -> SMPL -> projection -> save).
RUN python - <<'EOF'
import numpy as np, cv2, tempfile, os
img = np.random.randint(0, 255, (240, 320, 3), np.uint8)
p = os.path.join(tempfile.mkdtemp(), "in.png"); cv2.imwrite(p, img)
from romp_tpu.cli.romp import ROMP, romp_settings
s = romp_settings(["-i", p, "--model_path", "/none", "--smpl_path", "/none",
                   "--center_thresh", "-1000", "--compute_dtype", "float32",
                   "--max_person", "2"])
out = ROMP(s)(cv2.imread(p))
assert out is not None and out["verts"].shape[-2:] == (6890, 3)
print("smoke OK")
EOF

ENTRYPOINT ["romp"]
