"""Host input-pipeline cost breakdown (1-core loader host).

Times each stage of the training transform chain per image on the synthetic
ImageFolder: decode, Resize(S+8), TrivialAugment-NoColor (geometric), HFlip,
RandomResizedCrop(S+4), and (for reference) the host-side transform2.  This
locates what remains on the host after device-side transform2
(ops/device_augment) and what transform1-on-device would save.
"""

import time

import numpy as np
from PIL import Image


def timeit(fn, n=60):
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    import os
    import tempfile

    from pipnet_tpu.data.augment import (TwoViewTransform, random_resized_crop,
                                         resize)
    from pipnet_tpu.data.folder import scan_image_folder
    from pipnet_tpu.data.synthetic import generate_synthetic_dataset

    root_dir = os.path.join(tempfile.gettempdir(), "pipnet_bench_e2e_48_24")
    if not os.path.exists(os.path.join(root_dir, "train")):
        generate_synthetic_dataset(root_dir, num_classes=48,
                                   images_per_class=24, image_size=224, seed=0)
    folder = scan_image_folder(os.path.join(root_dir, "train"))
    rng = np.random.default_rng(0)
    tv = TwoViewTransform(224)

    path = folder.samples[0][0]

    img = Image.open(path)
    img.load()
    decoded = img.convert("RGB")
    resized = resize(decoded, tv.resize_to)
    ta_out = tv.ta_geo(resized, rng)
    flipped = ta_out.transpose(Image.FLIP_LEFT_RIGHT)
    rrc = random_resized_crop(flipped, tv.crop_to, rng)

    def open_decode():
        im = Image.open(path)
        im.load()
        return im.convert("RGB")

    rows = [
        ("decode (PNG open+load+RGB)", lambda: open_decode()),
        ("resize -> (S+8)^2", lambda: resize(decoded, tv.resize_to)),
        ("TA-NoColor geometric", lambda: tv.ta_geo(resized, rng)),
        ("hflip", lambda: ta_out.transpose(Image.FLIP_LEFT_RIGHT)),
        ("RandomResizedCrop -> (S+4)^2", lambda: random_resized_crop(flipped, tv.crop_to, rng)),
        ("np.asarray u8 ship", lambda: np.asarray(rrc.convert("RGB"), np.uint8)),
        ("full transform1 (geometric_view)", lambda: tv.geometric_view(decoded, rng)),
        ("host transform2 (one view)", lambda: tv.transform2(rrc, rng)),
        ("full host two-view __call__", lambda: tv(decoded, rng)),
    ]
    total = None
    for name, fn in rows:
        ms = timeit(fn)
        print(f"{name:38s} {ms:7.2f} ms/img")
        if name.startswith("full transform1"):
            total = ms
    print(f"\nimages/sec if host does decode+transform1 only: "
          f"{1000.0 / (timeit(open_decode) + (total or 1)):.1f}")


if __name__ == "__main__":
    main()
