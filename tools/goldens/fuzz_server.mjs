// Persistent reference-parser server for differential fuzzing.
// Protocol: one JSON request per stdin line ->
//   {"id": n, "string": "<html>", "options": {...}}        (parseString)
//   {"id": n, "bytes_b64": "...", "options": {...}}        (parseFile via temp file)
// one JSON response per stdout line: {"id": n, "result": {nodes|error}}.
// Run with:  node --import ./register.mjs fuzz_server.mjs
import { HTMLParser } from "/root/reference/src/HTMLParser.js";
import { createInterface } from "node:readline";
import { writeFileSync, mkdirSync } from "node:fs";
import { dirname, join } from "node:path";
import { fileURLToPath } from "node:url";

const TMPDIR = join(dirname(fileURLToPath(import.meta.url)), "tmp-fuzz");
mkdirSync(TMPDIR, { recursive: true });

function canonNode(node) {
  if ("tagName" in node) {
    const out = { tagName: node.tagName };
    if (node.attributes !== undefined)
      out.attributes = node.attributes.map((a) => ({ name: a.name, value: a.value, l: a.l, c: a.c }));
    if (node.children !== undefined) out.children = node.children.map(canonNode);
    out.l = node.l;
    out.c = node.c;
    return out;
  }
  if ("textContent" in node) return { textContent: node.textContent, l: node.l, c: node.c };
  if ("doctypeDeclaration" in node)
    return { doctypeDeclaration: node.doctypeDeclaration, l: node.l, c: node.c };
  if ("comment" in node) return { comment: node.comment, l: node.l, c: node.c };
  throw new Error("unknown node shape");
}

const rl = createInterface({ input: process.stdin });
for await (const line of rl) {
  if (!line.trim()) continue;
  const req = JSON.parse(line);
  const opts = req.options ?? {};
  let result;
  try {
    let parseResult;
    if (req.bytes_b64 !== undefined) {
      const p = join(TMPDIR, `f${req.id}.bin`);
      writeFileSync(p, Buffer.from(req.bytes_b64, "base64"));
      parseResult = new HTMLParser(opts).parseFile(p);
    } else {
      parseResult = new HTMLParser(opts).parseString(req.string);
    }
    const nodes = await parseResult.toArray();
    result = { nodes: nodes.map(canonNode) };
  } catch (err) {
    result = { error: err instanceof Error ? err.message : String(err) };
  }
  process.stdout.write(JSON.stringify({ id: req.id, result }) + "\n");
}
