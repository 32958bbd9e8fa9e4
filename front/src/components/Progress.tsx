import { PROCESSING_STATUSES } from "../types";
import type { StatusKey } from "../types";

const LABELS: Record<string, string> = {
  upload: "Uploading",
  pending: "Queued",
  running: "Starting",
  detection: "Detecting text",
  ocr: "Recognizing",
  textline_merge: "Merging lines",
  "mask-generation": "Building mask",
  inpainting: "Inpainting",
  upscaling: "Upscaling",
  translating: "Translating",
  rendering: "Rendering",
  finished: "Done",
  error: "Error",
};

export default function Progress({
  status,
  queuePos,
}: {
  status: StatusKey;
  queuePos: number | null;
}) {
  if (!status) return null;
  const idx = PROCESSING_STATUSES.indexOf(status);
  const pct =
    idx >= 0 ? ((idx + 1) / PROCESSING_STATUSES.length) * 100 : 100;
  return (
    <div className="progress">
      <div className="progress-bar">
        <div className="progress-fill" style={{ width: `${pct}%` }} />
      </div>
      <span className="progress-label">
        {LABELS[status] ?? status}
        {status === "pending" && queuePos !== null
          ? ` (#${queuePos})`
          : ""}
      </span>
    </div>
  );
}
