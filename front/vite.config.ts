import react from "@vitejs/plugin-react";
import { defineConfig } from "vite";

// The dev server proxies API calls to the gateway (server/main.py).
export default defineConfig({
  plugins: [react()],
  server: {
    proxy: {
      "/translate": "http://127.0.0.1:8000",
      "/queue-size": "http://127.0.0.1:8000",
      "/result": "http://127.0.0.1:8000",
    },
  },
  build: { outDir: "dist" },
});
