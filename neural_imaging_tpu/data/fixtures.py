"""
Synthetic data fixtures.

The reference toolbox depends on downloaded camera datasets (D90 RAW pairs,
native12k RGB crops); this module generates statistically rich procedural images and
writes reference-format training directories (``*.npy`` RGGB stacks + ``*.png`` RGB
targets) so every training / E2E path runs hermetically on any machine.
"""
import os

import imageio.v2 as imageio
import numpy as np
from scipy.ndimage import gaussian_filter

from neural_imaging_tpu.data import bayer, raw


def procedural_image(height, width, seed=0):
    """
    A procedurally textured RGB image in [0,1]: smooth color field + multi-scale
    texture + random geometric edges, designed to exercise demosaicing/compression
    (flat, textured and high-contrast content in each image).
    """
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float64)
    yy /= height
    xx /= width

    img = np.zeros((height, width, 3))
    # Smooth color gradient base
    for c in range(3):
        a, b, cph = rng.uniform(-1, 1, 3)
        img[..., c] = 0.5 + 0.25 * (a * xx + b * yy) + 0.15 * np.sin(2 * np.pi * (xx * rng.uniform(0.5, 2) + cph))

    # Multi-scale filtered noise texture (shared across channels with color tint)
    tex = np.zeros((height, width))
    for sigma, amp in ((1, 0.08), (4, 0.12), (16, 0.15)):
        noise = rng.standard_normal((height, width))
        tex += amp * gaussian_filter(noise, sigma) * (sigma ** 0.5)
    tint = rng.uniform(0.5, 1.0, 3)
    img += tex[..., None] * tint[None, None, :]

    # Random rectangles and discs with hard edges
    for _ in range(8):
        color = rng.uniform(0, 1, 3)
        if rng.uniform() < 0.5:
            y0, x0 = rng.integers(0, height - 8), rng.integers(0, width - 8)
            h = int(rng.integers(height // 16, height // 3))
            w = int(rng.integers(width // 16, width // 3))
            img[y0:y0 + h, x0:x0 + w] = 0.6 * img[y0:y0 + h, x0:x0 + w] + 0.4 * color
        else:
            cy, cx = rng.integers(0, height), rng.integers(0, width)
            r = int(rng.integers(min(height, width) // 16, min(height, width) // 4))
            mask = (yy * height - cy) ** 2 + (xx * width - cx) ** 2 < r ** 2
            img[mask] = 0.6 * img[mask] + 0.4 * color

    return np.clip(img, 0, 1)


def make_raw_rgb_pair(height, width, seed=0, cfa_pattern='GBRG', cam2srgb='example'):
    """
    Simulate a camera capture: scene RGB → camera color space → linear → Bayer
    mosaic → (uint16 RGGB stack, uint8 developed RGB). The RGB target is developed
    from the mosaic with the scratch pipeline (bilinear demosaic → cam2sRGB →
    gamma), so RAW→RGB is a consistent, learnable mapping — the role played by
    libRAW-developed targets in the reference (train_prepare_training_set.py).

    By default the synthetic camera uses the EXAMPLE_SRGB color profile, matching
    the calibrated initialization of INet's color stage (as real camera data
    matches its calibration in the reference setup).
    """
    from neural_imaging_tpu.ops.kernels import EXAMPLE_SRGB
    if isinstance(cam2srgb, str) and cam2srgb == 'example':
        cam2srgb = EXAMPLE_SRGB

    scene = procedural_image(height, width, seed)
    if cam2srgb is not None:
        # scene is defined in sRGB; sample the sensor in camera RGB space
        cam_linear = np.einsum('ij,hwj->hwi', np.linalg.inv(cam2srgb),
                               np.power(scene, 2.2))
        cam_linear = np.clip(cam_linear, 0, 1)
    else:
        cam_linear = np.power(scene, 2.2)
    mosaic = bayer.mosaic_flat(cam_linear, cfa_pattern)
    stack = bayer.stack_bayer(
        np.stack([mosaic * m for m in raw._cfa_masks(mosaic.shape, cfa_pattern)], axis=-1),
        cfa_pattern)
    stack_u16 = np.clip(stack * (2 ** 16 - 1), 0, 2 ** 16 - 1).round().astype(np.uint16)

    developed = raw.develop_mosaic(mosaic, cfa_pattern, cam2srgb=cam2srgb,
                                   brightness=None, use_gamma=True,
                                   demosaicing='bilinear')
    rgb_u8 = np.clip(developed * 255, 0, 255).round().astype(np.uint8)
    return stack_u16, rgb_u8


def make_dataset(directory, n_images=8, height=256, width=384, seed=1000,
                 cfa_pattern='GBRG', rgb_only=False):
    """Write a reference-format training directory of synthetic pairs."""
    os.makedirs(directory, exist_ok=True)
    for i in range(n_images):
        stack_u16, rgb_u8 = make_raw_rgb_pair(height, width, seed=seed + i, cfa_pattern=cfa_pattern)
        name = f'synthetic_{i:04d}'
        imageio.imwrite(os.path.join(directory, name + '.png'), rgb_u8)
        if not rgb_only:
            np.save(os.path.join(directory, name + '.npy'), stack_u16)
    return directory


def kodak_like_batch(n=4, height=512, width=768, seed=77):
    """Procedural stand-in for the Kodak benchmark set (float32 RGB in [0,1])."""
    return np.stack([procedural_image(height, width, seed + i) for i in range(n)]).astype(np.float32)


# -----------------------------------------------------------------------------------
# Real photographic content (non-procedural fixtures)
# -----------------------------------------------------------------------------------

def real_photo():
    """A real photograph as float RGB in [0,1] (even dimensions), or None when no
    photographic sample is available in the environment. Currently sources the
    public-domain portrait shipped with matplotlib."""
    try:
        import matplotlib
        base = matplotlib.get_data_path()
    except ImportError:
        return None
    path = os.path.join(base, 'sample_data', 'grace_hopper.jpg')
    if not os.path.isfile(path):
        return None
    im = imageio.imread(path).astype(np.float64) / 255.0
    h, w = (im.shape[0] // 2) * 2, (im.shape[1] // 2) * 2
    return im[:h, :w, :3]


def make_dng_capture(filename, image_rgb=None, cfa_pattern='RGGB', seed=0,
                     cam_mul=(2.0, 1.0, 1.5, 1.0), cam2srgb='example',
                     black=512, white=16383, camera='SimCam-DNG',
                     compression='none'):
    """
    Simulate a 14-bit camera capture and write it as a real uncompressed DNG file
    (parsable by any DNG-aware tool): sRGB scene → linear → camera color space →
    inverse white balance → CFA mosaic → black level/quantization → DNG container
    with ColorMatrix1/AsShotNeutral metadata.

    With ``image_rgb=None`` uses the environment's real photograph (falling back to
    a procedural scene), so the full camera→training-pair ingestion path is
    exercised on genuine photographic content.
    """
    from neural_imaging_tpu.data import dng
    from neural_imaging_tpu.ops.kernels import EXAMPLE_SRGB

    if isinstance(cam2srgb, str) and cam2srgb == 'example':
        cam2srgb = EXAMPLE_SRGB
    if image_rgb is None:
        image_rgb = real_photo()
        if image_rgb is None:
            image_rgb = procedural_image(512, 512, seed)

    mosaic_u16 = simulate_sensor_mosaic(image_rgb, cfa_pattern, cam_mul, cam2srgb,
                                        black, white)
    return dng.write_dng(filename, mosaic_u16, cfa_pattern=cfa_pattern, black=black,
                         white=white, cam_mul=tuple(cam_mul), cam2srgb=cam2srgb,
                         camera=camera, compression=compression)


def simulate_sensor_mosaic(image_rgb, cfa_pattern, cam_mul, cam2srgb, black, white):
    """sRGB scene → linear → camera space → inverse WB → CFA mosaic → levels."""
    linear = np.power(np.clip(image_rgb, 0, 1), 2.2)
    cam_linear = np.clip(np.einsum('ij,hwj->hwi', np.linalg.inv(cam2srgb), linear), 0, 1)

    # sensor records the scene BEFORE white balance: divide by the multipliers
    cam_mul = np.asarray(cam_mul, dtype=np.float64)
    gains = cam_mul / cam_mul[1]
    sensor = cam_linear / np.array([gains[0], 1.0, gains[2]])[None, None, :]

    mosaic = bayer.mosaic_flat(np.clip(sensor, 0, 1), cfa_pattern)
    return np.clip(black + mosaic * (white - black), 0, 65535).round().astype(np.uint16)


def make_camera_capture(filename, fmt=None, image_rgb=None, cfa_pattern='RGGB',
                        seed=0, cam_mul=(2.0, 1.0, 1.5, 1.0), cam2srgb='example',
                        black=512, white=16383):
    """Simulate the same 14-bit capture as :func:`make_dng_capture` but write a
    vendor container (``fmt`` in {'cr2', 'nef', 'arw'}; default from the file
    extension) via data/camera_raw.py — the native no-libRAW ingestion path for
    non-DNG camera files. Returns the filename.

    CR2 carries the as-shot WB in its MakerNote ColorData block; NEF/ARW
    containers have no standard WB/color tags, so those fixtures are written
    with the sensor mosaic only (develop with an explicit camera profile)."""
    from neural_imaging_tpu.data import camera_raw
    from neural_imaging_tpu.ops.kernels import EXAMPLE_SRGB

    if fmt is None:
        fmt = os.path.splitext(filename)[1].lstrip('.').lower()
    if isinstance(cam2srgb, str) and cam2srgb == 'example':
        cam2srgb = EXAMPLE_SRGB
    if image_rgb is None:
        image_rgb = real_photo()
        if image_rgb is None:
            image_rgb = procedural_image(512, 512, seed)

    mosaic_u16 = simulate_sensor_mosaic(image_rgb, cfa_pattern, cam_mul, cam2srgb,
                                        black, white)
    if fmt == 'cr2':
        return camera_raw.write_cr2(filename, mosaic_u16, cfa_pattern=cfa_pattern,
                                    precision=14, cam_mul=cam_mul, black=black,
                                    white=white, camera='SimCam-CR2')
    if fmt == 'nef':
        return camera_raw.write_nef(filename, mosaic_u16, cfa_pattern=cfa_pattern,
                                    bits=14, black=black, white=white,
                                    camera='SimCam-NEF')
    if fmt == 'arw':
        return camera_raw.write_arw(filename, mosaic_u16, cfa_pattern=cfa_pattern,
                                    bits=16, black=black, white=white,
                                    camera='SimCam-ARW')
    raise ValueError(f'Unsupported camera container: {fmt!r}')


def make_quality_dataset(directory, n_images=60, height=256, width=384, seed=900,
                         cfa_pattern='GBRG', noise=None):
    """
    A reference-scale training set (default 60 images, the 40:20:1 split's total):
    half simulated captures of real photographic content (random crops/flips/
    exposure variants of the environment's sample photo), half procedural scenes.
    Written in the reference's directory format (.npy RGGB stacks + .png targets).

    ``noise``: optional ``(shot, read)`` sensor-noise model applied to the RAW
    mosaic ONLY — std = sqrt(shot²·signal + read²) in normalized units (e.g.
    ``(0.02, 0.01)`` ≈ a high-ISO capture) — while the .png target is developed
    from the CLEAN mosaic, so ISPs train on a joint denoise+demosaic task (the
    regime the reference's learnable DemosaicingLayer targets,
    ref models/layers.py:206-258).
    """
    os.makedirs(directory, exist_ok=True)
    photo = real_photo()
    rng = np.random.default_rng(seed)
    from neural_imaging_tpu.ops.kernels import EXAMPLE_SRGB

    for i in range(n_images):
        use_photo = photo is not None and i % 2 == 0
        if use_photo:
            h, w = photo.shape[:2]
            ch, cw = min(height, h), min(width, w)
            y0 = int(rng.integers(0, h - ch + 1)) // 2 * 2
            x0 = int(rng.integers(0, w - cw + 1)) // 2 * 2
            crop = photo[y0:y0 + ch, x0:x0 + cw]
            if rng.uniform() < 0.5:
                crop = crop[:, ::-1]
            if rng.uniform() < 0.5:
                crop = crop[::-1, :]
            crop = np.clip(crop * rng.uniform(0.7, 1.15), 0, 1)
            scene = np.ascontiguousarray(crop)
        else:
            scene = procedural_image(height, width, seed + i)

        cam_linear = np.clip(np.einsum('ij,hwj->hwi', np.linalg.inv(EXAMPLE_SRGB),
                                       np.power(scene, 2.2)), 0, 1)
        mosaic = bayer.mosaic_flat(cam_linear, cfa_pattern)
        mosaic_captured = mosaic
        if noise is not None:
            shot, read = noise
            sigma = np.sqrt(shot * shot * mosaic + read * read)
            mosaic_captured = np.clip(
                mosaic + sigma * rng.standard_normal(mosaic.shape), 0, 1)
        stack = bayer.stack_bayer(
            np.stack([mosaic_captured * m
                      for m in raw._cfa_masks(mosaic.shape, cfa_pattern)],
                     axis=-1), cfa_pattern)
        stack_u16 = np.clip(stack * 65535, 0, 65535).round().astype(np.uint16)
        developed = raw.develop_mosaic(mosaic, cfa_pattern, cam2srgb=EXAMPLE_SRGB,
                                       brightness=None, use_gamma=True,
                                       demosaicing='menon')
        name = f'quality_{i:04d}'
        imageio.imwrite(os.path.join(directory, name + '.png'),
                        np.clip(developed * 255, 0, 255).round().astype(np.uint8))
        np.save(os.path.join(directory, name + '.npy'), stack_u16)
    return directory


def make_dng_dataset(directory, n_images=4, cfa_pattern='RGGB', seed=400):
    """A directory of real-content DNG captures (different crops/augmentations of
    the photographic sample) for end-to-end ingestion tests."""
    os.makedirs(directory, exist_ok=True)
    photo = real_photo()
    rng = np.random.default_rng(seed)
    files = []
    for i in range(n_images):
        if photo is not None:
            h, w = photo.shape[:2]
            ch, cw = min(384, h), min(384, w)
            y0 = int(rng.integers(0, h - ch + 1)) // 2 * 2
            x0 = int(rng.integers(0, w - cw + 1)) // 2 * 2
            crop = photo[y0:y0 + ch, x0:x0 + cw]
            if i % 2 == 1:
                crop = crop[:, ::-1]  # mirrored variant
        else:
            crop = procedural_image(384, 384, seed + i)
        path = os.path.join(directory, f'capture_{i:04d}.dng')
        make_dng_capture(path, image_rgb=np.ascontiguousarray(crop),
                         cfa_pattern=cfa_pattern, seed=seed + i)
        files.append(path)
    return files
