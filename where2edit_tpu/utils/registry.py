"""External checkpoint registry (reference utils.py:23-67).

Zero-egress environments can't auto-download; ``ensure_checkpoint_exists``
fetches via gdown when importable, otherwise prints the URL like the
reference's fallback path.
"""

from __future__ import annotations

import os

GOOGLE_DRIVE_PATHS = {
    "stylegan2-ffhq-config-f.pt":
        "https://drive.google.com/uc?id=1EM87UquaoQmk17Q8d5kYIAHqu0dkYqdT",
    "example_celebs.pt":
        "https://drive.google.com/uc?id=1VL3lP4avRhz75LxSza6jgDe-pHd2veQG",
}
# 14 pretrained StyleCLIP mappers (utils.py:26-39)
for _name, _gid in [
    ("afro", "1i5vAqo4z0I-Yon3FNft_YZOq7ClWayQJ"),
    ("angry", "1g82HEH0jFDrcbCtn3M22gesWKfzWV_ma"),
    ("beyonce", "1KJTc-h02LXs4zqCyo7pzCp0iWeO6T9fz"),
    ("bobcut", "1IvyqjZzKS-vNdq_OhwapAcwrxgLAY8UF"),
    ("bowlcut", "1xwdxI2YCewSt05dEHgkpmmzoauPjEnnZ"),
    ("curly_hair", "1xZ7fFB12Ci6rUbUfaHPpo44xUFzpWQ6M"),
    ("depp", "1FPiJkvFPG_y-bFanxLLP91wUKuy-l3IV"),
    ("hilary_clinton", "1X7U2zj2lt0KFifIsTfOOzVZXqYyCWVll"),
    ("mohawk", "1oMMPc8iQZ7dhyWavZ7VNWLwzf9aX4C09"),
    ("purple_hair", "14H0CGXWxePrrKIYmZnDD2Ccs65EEww75"),
    ("surprised", "1F-mPrhO-UeWrV1QYMZck63R43aLtPChI"),
    ("taylor_swift", "10jHuHsKKJxuf3N0vgQbX_SMEQgFHDrZa"),
    ("trump", "14v8D0uzy4tOyfBU3ca9T0AzTt3v-dNyh"),
    ("zuckerberg", "1NjDcMUL8G-pO3i_9N6EPpQNXeMc3Ar1r"),
]:
    GOOGLE_DRIVE_PATHS[f"mapper/pretrained/{_name}.pt"] = \
        f"https://drive.google.com/uc?id={_gid}"


def ensure_checkpoint_exists(model_weights_filename: str) -> bool:
    """utils.py:45-67: download when possible, otherwise tell the user how."""
    if os.path.isfile(model_weights_filename):
        return True
    url = GOOGLE_DRIVE_PATHS.get(model_weights_filename)
    if url is None:
        print(f"{model_weights_filename} not found; no registry entry — "
              "download the weights manually.")
        return False
    try:
        from gdown import download as drive_download  # noqa: PLC0415

        drive_download(url, model_weights_filename, quiet=False)
        return os.path.isfile(model_weights_filename)
    except ImportError:
        print("gdown module not found. pip3 install gdown or manually "
              f"download the checkpoint file: {url}")
        return False
