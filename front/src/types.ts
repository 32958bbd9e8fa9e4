// Pipeline progress states emitted over the streaming byte protocol
// (server/main.py: 1-byte status + u32 length frames).
export type StatusKey =
  | "upload"
  | "pending"
  | "running"
  | "detection"
  | "ocr"
  | "textline_merge"
  | "mask-generation"
  | "inpainting"
  | "upscaling"
  | "translating"
  | "rendering"
  | "finished"
  | "error"
  | "error-upload"
  | "error-disconnect"
  | null;

export const PROCESSING_STATUSES: StatusKey[] = [
  "upload",
  "pending",
  "running",
  "detection",
  "ocr",
  "textline_merge",
  "mask-generation",
  "inpainting",
  "upscaling",
  "translating",
  "rendering",
];

export interface QueueItem {
  id: string;
  file: File;
  previewUrl: string;
  status: StatusKey;
  statusText: string;
  queuePos: number | null;
  resultUrl: string | null;
  error: string | null;
}

export interface TranslateOptions {
  detector: string;
  detectionSize: number;
  ocr: string;
  inpainter: string;
  inpaintingSize: number;
  translator: string;
  targetLang: string;
  direction: string;
  upscaler: string;
  upscaleRatio: number | null;
  colorizer: string;
  fontSize: number | null;
  maskDilationOffset: number;
}
