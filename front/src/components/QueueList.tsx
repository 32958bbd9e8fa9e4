import type { QueueItem } from "../types";
import Progress from "./Progress";

interface Props {
  items: QueueItem[];
  onRemove: (id: string) => void;
  onRetry: (id: string) => void;
}

export default function QueueList({ items, onRemove, onRetry }: Props) {
  const active = items.filter((it) => it.status !== "finished");
  if (!active.length) return null;
  return (
    <div className="queue-list">
      <h2>Queue</h2>
      {active.map((it) => (
        <div key={it.id} className="queue-item">
          <img src={it.previewUrl} alt={it.file.name} />
          <div className="queue-item-body">
            <span className="file-name">{it.file.name}</span>
            {it.error ? (
              <span className="error-text">{it.error}</span>
            ) : (
              <Progress status={it.status} queuePos={it.queuePos} />
            )}
          </div>
          <div className="queue-item-actions">
            {it.error && (
              <button onClick={() => onRetry(it.id)}>retry</button>
            )}
            <button onClick={() => onRemove(it.id)}>×</button>
          </div>
        </div>
      ))}
    </div>
  );
}
