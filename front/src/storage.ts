// Persist the options panel across sessions.
import { DEFAULT_OPTIONS } from "./config";
import type { TranslateOptions } from "./types";

const KEY = "mit-tpu-options-v1";

export function loadOptions(): TranslateOptions {
  try {
    const raw = localStorage.getItem(KEY);
    if (!raw) return { ...DEFAULT_OPTIONS };
    return { ...DEFAULT_OPTIONS, ...(JSON.parse(raw) as object) };
  } catch {
    return { ...DEFAULT_OPTIONS };
  }
}

export function saveOptions(options: TranslateOptions): void {
  try {
    localStorage.setItem(KEY, JSON.stringify(options));
  } catch {
    /* private mode etc. */
  }
}
