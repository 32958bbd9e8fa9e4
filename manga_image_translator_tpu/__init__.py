"""TPU-native manga/image translation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
zyddnys/manga-image-translator: detection, OCR, textline merging, translation,
mask refinement, inpainting, upscaling, colorization, and rendering — with the
device path (detect/OCR/inpaint/upscale/colorize + dense mask work) as
jit-compiled XLA programs and the host path (translators, typesetting, IO)
overlapped with device compute.
"""

__version__ = '0.1.0'
