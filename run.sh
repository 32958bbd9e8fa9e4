#!/bin/bash
python -m manga_image_translator_tpu.server.main --use-gpu --start-instance "$@"
