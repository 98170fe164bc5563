// Module-resolution hook: redirect `import "piscina"` to the in-process shim.
import { pathToFileURL } from "node:url";
import { dirname, join } from "node:path";
import { fileURLToPath } from "node:url";

const here = dirname(fileURLToPath(import.meta.url));
const shimURL = pathToFileURL(join(here, "piscina-shim.mjs")).href;

export async function resolve(specifier, context, nextResolve) {
  if (specifier === "piscina") {
    return { url: shimURL, shortCircuit: true };
  }
  return nextResolve(specifier, context);
}
