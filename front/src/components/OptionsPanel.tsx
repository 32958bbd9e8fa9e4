import {
  COLORIZERS,
  DETECTION_SIZES,
  DETECTORS,
  DIRECTIONS,
  INPAINTERS,
  INPAINTING_SIZES,
  LANGUAGES,
  OCRS,
  TRANSLATORS,
  UPSCALERS,
} from "../config";
import type { TranslateOptions } from "../types";
import NumberInput from "./NumberInput";
import Select from "./Select";

interface Props {
  options: TranslateOptions;
  onChange: (options: TranslateOptions) => void;
}

export default function OptionsPanel({ options, onChange }: Props) {
  const set = <K extends keyof TranslateOptions>(
    key: K,
    value: TranslateOptions[K],
  ) => onChange({ ...options, [key]: value });

  return (
    <div className="options-panel">
      <h2>Options</h2>
      <Select
        label="Detector"
        value={options.detector}
        options={DETECTORS}
        onChange={(v) => set("detector", v)}
      />
      <Select
        label="Detection size"
        value={String(options.detectionSize)}
        options={DETECTION_SIZES.map(
          (s) => [String(s), `${s}px`] as const,
        )}
        onChange={(v) => set("detectionSize", Number(v))}
      />
      <Select
        label="OCR"
        value={options.ocr}
        options={OCRS}
        onChange={(v) => set("ocr", v)}
      />
      <Select
        label="Inpainter"
        value={options.inpainter}
        options={INPAINTERS}
        onChange={(v) => set("inpainter", v)}
      />
      <Select
        label="Inpainting size"
        value={String(options.inpaintingSize)}
        options={INPAINTING_SIZES.map(
          (s) => [String(s), `${s}px`] as const,
        )}
        onChange={(v) => set("inpaintingSize", Number(v))}
      />
      <Select
        label="Translator"
        value={options.translator}
        options={TRANSLATORS}
        onChange={(v) => set("translator", v)}
      />
      <Select
        label="Target language"
        value={options.targetLang}
        options={LANGUAGES}
        onChange={(v) => set("targetLang", v)}
      />
      <Select
        label="Text direction"
        value={options.direction}
        options={DIRECTIONS}
        onChange={(v) => set("direction", v)}
      />
      <Select
        label="Upscaler"
        value={options.upscaler}
        options={UPSCALERS}
        onChange={(v) => set("upscaler", v)}
      />
      <Select
        label="Colorizer"
        value={options.colorizer}
        options={COLORIZERS}
        onChange={(v) => set("colorizer", v)}
      />
      <NumberInput
        label="Font size (auto)"
        value={options.fontSize}
        placeholder="auto"
        onChange={(v) => set("fontSize", v)}
      />
      <NumberInput
        label="Mask dilation"
        value={options.maskDilationOffset}
        onChange={(v) => set("maskDilationOffset", v ?? 30)}
      />
    </div>
  );
}
