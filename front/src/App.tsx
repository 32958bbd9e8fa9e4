import { useCallback, useEffect, useRef, useState } from "react";
import { fetchQueueSize, translateStream } from "./api";
import { buildConfig } from "./config";
import Header from "./components/Header";
import OptionsPanel from "./components/OptionsPanel";
import QueueList from "./components/QueueList";
import ResultGallery from "./components/ResultGallery";
import UploadArea from "./components/UploadArea";
import { loadOptions, saveOptions } from "./storage";
import type { QueueItem, TranslateOptions } from "./types";

let nextId = 1;

export default function App() {
  const [options, setOptions] = useState<TranslateOptions>(loadOptions);
  const [items, setItems] = useState<QueueItem[]>([]);
  const [serverQueue, setServerQueue] = useState(0);
  const running = useRef(false);

  useEffect(() => saveOptions(options), [options]);

  useEffect(() => {
    const t = setInterval(async () => {
      setServerQueue(await fetchQueueSize());
    }, 5000);
    return () => clearInterval(t);
  }, []);

  const update = useCallback(
    (id: string, patch: Partial<QueueItem>) =>
      setItems((prev) =>
        prev.map((it) => (it.id === id ? { ...it, ...patch } : it)),
      ),
    [],
  );

  const addFiles = useCallback((files: FileList | File[]) => {
    const fresh: QueueItem[] = Array.from(files)
      .filter((f) => f.type.startsWith("image/"))
      .map((file) => ({
        id: `q${nextId++}`,
        file,
        previewUrl: URL.createObjectURL(file),
        status: null,
        statusText: "",
        queuePos: null,
        resultUrl: null,
        error: null,
      }));
    setItems((prev) => [...prev, ...fresh]);
  }, []);

  // Sequential pump: translate queued items one at a time.
  useEffect(() => {
    if (running.current) return;
    const next = items.find(
      (it) => it.status === null && !it.resultUrl && !it.error,
    );
    if (!next) return;
    running.current = true;
    update(next.id, { status: "upload", statusText: "upload" });
    translateStream(next.file, buildConfig(options), {
      onProgress: (status, raw) =>
        update(next.id, { status, statusText: raw, queuePos: null }),
      onQueuePos: (pos) =>
        update(next.id, { status: "pending", queuePos: pos }),
      onResult: (blob) =>
        update(next.id, {
          status: "finished",
          resultUrl: URL.createObjectURL(blob),
        }),
      onError: (message) =>
        update(next.id, { status: "error", error: message }),
    }).finally(() => {
      running.current = false;
      // re-trigger the effect for the next queued item
      setItems((prev) => [...prev]);
    });
    // eslint-disable-next-line react-hooks/exhaustive-deps
  }, [items]);

  const clearFinished = () =>
    setItems((prev) => prev.filter((it) => it.status !== "finished"));
  const removeItem = (id: string) =>
    setItems((prev) => prev.filter((it) => it.id !== id));
  const retryItem = (id: string) =>
    update(id, { status: null, error: null, statusText: "" });

  return (
    <div className="app">
      <Header serverQueue={serverQueue} />
      <main>
        <section className="left">
          <UploadArea onFiles={addFiles} />
          <OptionsPanel options={options} onChange={setOptions} />
        </section>
        <section className="right">
          <QueueList
            items={items}
            onRemove={removeItem}
            onRetry={retryItem}
          />
          <ResultGallery items={items} onClearFinished={clearFinished} />
        </section>
      </main>
    </div>
  );
}
