// Streaming client for the gateway's byte protocol:
// each frame is [1-byte status][u32 big-endian length][payload].
// Status codes (server/main.py _frame): 0=result image, 1=progress text,
// 2=error text, 3=queue position, 4=translations json.
import type { StatusKey } from "./types";

export interface StreamCallbacks {
  onProgress: (status: StatusKey, raw: string) => void;
  onQueuePos: (pos: number) => void;
  onResult: (blob: Blob) => void;
  onError: (message: string) => void;
}

export async function translateStream(
  file: File,
  config: object,
  cb: StreamCallbacks,
): Promise<void> {
  const form = new FormData();
  form.append("image", file);
  form.append("config", JSON.stringify(config));
  let resp: Response;
  try {
    resp = await fetch("/translate/with-form/image/stream", {
      method: "POST",
      body: form,
    });
  } catch (e) {
    cb.onError("error-disconnect");
    return;
  }
  if (!resp.ok || !resp.body) {
    cb.onError(`error-upload (${resp.status})`);
    return;
  }
  const reader = resp.body.getReader();
  let buffer = new Uint8Array(0);

  const append = (chunk: Uint8Array) => {
    const merged = new Uint8Array(buffer.length + chunk.length);
    merged.set(buffer);
    merged.set(chunk, buffer.length);
    buffer = merged;
  };

  for (;;) {
    const { done, value } = await reader.read();
    if (done) break;
    if (value) append(value);
    // drain complete frames
    for (;;) {
      if (buffer.length < 5) break;
      const status = buffer[0];
      const size =
        (buffer[1] << 24) | (buffer[2] << 16) | (buffer[3] << 8) | buffer[4];
      if (buffer.length < 5 + size) break;
      const payload = buffer.slice(5, 5 + size);
      buffer = buffer.slice(5 + size);
      switch (status) {
        case 0:
          cb.onResult(new Blob([payload], { type: "image/png" }));
          return;
        case 1: {
          const text = new TextDecoder().decode(payload);
          cb.onProgress(normalizeStatus(text), text);
          break;
        }
        case 2:
          cb.onError(new TextDecoder().decode(payload));
          return;
        case 3:
          cb.onQueuePos(parseInt(new TextDecoder().decode(payload), 10));
          break;
        default:
          break; // 4 = translations json and future frames: ignored here
      }
    }
  }
}

function normalizeStatus(raw: string): StatusKey {
  const key = raw.split(":")[0];
  const known: StatusKey[] = [
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
    "finished",
    "error",
  ];
  return (known as string[]).includes(key) ? (key as StatusKey) : "running";
}

export async function fetchQueueSize(): Promise<number> {
  try {
    const r = await fetch("/queue-size");
    return (await r.json()) as number;
  } catch {
    return 0;
  }
}
