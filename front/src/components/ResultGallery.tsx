import { useState } from "react";
import type { QueueItem } from "../types";

interface Props {
  items: QueueItem[];
  onClearFinished: () => void;
}

export default function ResultGallery({ items, onClearFinished }: Props) {
  const finished = items.filter((it) => it.resultUrl);
  const [compare, setCompare] = useState<string | null>(null);
  if (!finished.length) return null;

  const download = (it: QueueItem) => {
    const a = document.createElement("a");
    a.href = it.resultUrl!;
    a.download = it.file.name.replace(/(\.[^.]+)?$/, "-translated.png");
    a.click();
  };

  const downloadAll = () => finished.forEach(download);

  return (
    <div className="result-gallery">
      <div className="gallery-header">
        <h2>Results</h2>
        <button onClick={downloadAll}>download all</button>
        <button onClick={onClearFinished}>clear</button>
      </div>
      <div className="gallery-grid">
        {finished.map((it) => (
          <figure key={it.id} className="result-card">
            <img
              src={compare === it.id ? it.previewUrl : it.resultUrl!}
              alt={it.file.name}
              onMouseDown={() => setCompare(it.id)}
              onMouseUp={() => setCompare(null)}
              onMouseLeave={() => setCompare(null)}
              title="hold to compare with the original"
            />
            <figcaption>
              <span>{it.file.name}</span>
              <button onClick={() => download(it)}>save</button>
            </figcaption>
          </figure>
        ))}
      </div>
    </div>
  );
}
