export default function Header({ serverQueue }: { serverQueue: number }) {
  return (
    <header className="header">
      <h1>Manga Image Translator</h1>
      <span className="badge">TPU</span>
      {serverQueue > 0 && (
        <span className="queue-size">server queue: {serverQueue}</span>
      )}
      <a
        className="doc-link"
        href="https://github.com/zyddnys/manga-image-translator"
        target="_blank"
        rel="noreferrer"
      >
        docs
      </a>
    </header>
  );
}
