"""Pre-download model checkpoints into the image cache (counterpart of the
reference's docker_prepare.py)."""
import asyncio


async def main():
    from manga_image_translator_tpu.detection import Detector, get_detector
    from manga_image_translator_tpu.inpainting import (
        Inpainter, get_inpainter)
    from manga_image_translator_tpu.ocr import Ocr, get_ocr
    from manga_image_translator_tpu.upscaling import Upscaler, get_upscaler

    jobs = [
        get_detector(Detector.default),
        get_detector(Detector.ctd),
        get_ocr(Ocr.ocr48px),
        get_inpainter(Inpainter.lama_large),
        get_inpainter(Inpainter.default),
        get_upscaler(Upscaler.esrgan),
        get_upscaler(Upscaler.waifu2x),
    ]
    for job in jobs:
        try:
            await job.download()
            print(f'downloaded: {type(job).__name__}')
        except Exception as e:
            print(f'skipped {type(job).__name__}: {e}')

    # hyphenation pattern dictionaries (reference pulls them via pyhyphen
    # at render time; bake them into the image instead)
    from manga_image_translator_tpu.rendering.hyphenation import \
        download_dictionaries
    langs = download_dictionaries()
    print(f'hyphenation dictionaries: {len(langs)} provisioned')


if __name__ == '__main__':
    asyncio.run(main())
