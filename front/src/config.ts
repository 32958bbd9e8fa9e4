// Option catalogs mirroring manga_image_translator_tpu/config.py enums.
import type { TranslateOptions } from "./types";

export const DETECTORS = [
  ["default", "Default (DBNet)"],
  ["dbconvnext", "DBNet ConvNeXt"],
  ["ctd", "Comic Text Detector"],
  ["craft", "CRAFT"],
  ["paddle", "Paddle OCR"],
  ["none", "None"],
] as const;

export const OCRS = [
  ["48px", "48px (default)"],
  ["48px_ctc", "48px CTC"],
  ["32px", "32px"],
  ["mocr", "manga-ocr"],
] as const;

export const INPAINTERS = [
  ["lama_large", "LaMa Large (recommended)"],
  ["lama_mpe", "LaMa MPE"],
  ["default", "AOT-GAN"],
  ["sd", "Stable Diffusion"],
  ["original", "Original (no inpainting)"],
  ["none", "None (white fill)"],
] as const;

export const TRANSLATORS = [
  ["sugoi", "Sugoi (ja->en, offline)"],
  ["jparacrawl", "JParaCrawl"],
  ["jparacrawl_big", "JParaCrawl Big"],
  ["m2m100", "M2M100"],
  ["m2m100_big", "M2M100 Big"],
  ["m2m100_hf", "M2M100 (HF)"],
  ["nllb", "NLLB"],
  ["nllb_big", "NLLB Big"],
  ["mbart50", "mBART-50"],
  ["qwen2", "Qwen2"],
  ["qwen2_big", "Qwen2 Big"],
  ["chatgpt", "OpenAI"],
  ["deepseek", "DeepSeek"],
  ["groq", "Groq"],
  ["gemini", "Gemini"],
  ["custom_openai", "Custom OpenAI"],
  ["deepl", "DeepL"],
  ["youdao", "Youdao"],
  ["baidu", "Baidu"],
  ["papago", "Papago"],
  ["caiyun", "Caiyun"],
  ["original", "Original text"],
  ["none", "Remove text"],
] as const;

export const LANGUAGES = [
  ["ENG", "English"],
  ["CHS", "简体中文"],
  ["CHT", "繁體中文"],
  ["JPN", "日本語"],
  ["KOR", "한국어"],
  ["VIN", "Tiếng Việt"],
  ["CSY", "čeština"],
  ["NLD", "Nederlands"],
  ["FRA", "français"],
  ["DEU", "Deutsch"],
  ["HUN", "magyar"],
  ["ITA", "italiano"],
  ["POL", "polski"],
  ["PTB", "português"],
  ["ROM", "română"],
  ["RUS", "русский"],
  ["ESP", "español"],
  ["TRK", "Türkçe"],
  ["UKR", "українська"],
  ["ARA", "العربية"],
  ["SRP", "српски"],
  ["HRV", "hrvatski"],
  ["THA", "ไทย"],
  ["IND", "Indonesia"],
  ["FIL", "Filipino"],
] as const;

export const DIRECTIONS = [
  ["auto", "Auto"],
  ["h", "Horizontal"],
  ["v", "Vertical"],
] as const;

export const UPSCALERS = [
  ["", "None"],
  ["esrgan", "ESRGAN"],
  ["4xultrasharp", "4x UltraSharp"],
  ["waifu2x", "Waifu2x"],
] as const;

export const COLORIZERS = [
  ["none", "None"],
  ["mc2", "Manga Colorization v2"],
] as const;

export const DETECTION_SIZES = [1024, 1536, 2048, 2560];
export const INPAINTING_SIZES = [516, 1024, 2048];

export const DEFAULT_OPTIONS: TranslateOptions = {
  detector: "default",
  detectionSize: 2048,
  ocr: "48px",
  inpainter: "lama_large",
  inpaintingSize: 2048,
  translator: "sugoi",
  targetLang: "ENG",
  direction: "auto",
  upscaler: "",
  upscaleRatio: null,
  colorizer: "none",
  fontSize: null,
  maskDilationOffset: 30,
};

export function buildConfig(o: TranslateOptions): object {
  return {
    detector: {
      detector: o.detector,
      detection_size: o.detectionSize,
    },
    ocr: { ocr: o.ocr },
    inpainter: {
      inpainter: o.inpainter,
      inpainting_size: o.inpaintingSize,
    },
    translator: {
      translator: o.translator,
      target_lang: o.targetLang,
    },
    render: {
      direction: o.direction,
      font_size: o.fontSize,
    },
    upscale: {
      upscaler: o.upscaler || "esrgan",
      upscale_ratio: o.upscaleRatio,
    },
    colorizer: { colorizer: o.colorizer },
    mask_dilation_offset: o.maskDilationOffset,
  };
}
