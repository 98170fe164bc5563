// Drives gen_goldens.mjs one case per subprocess; merges into goldens.json.
// A case that crashes the reference internally (uncaught stream-state errors
// on some malformed inputs) is recorded as {error: "<reference crash: ...>"}.
import { execFileSync, spawnSync } from "node:child_process";
import { writeFileSync } from "node:fs";
import { dirname, join } from "node:path";
import { fileURLToPath } from "node:url";

const here = dirname(fileURLToPath(import.meta.url));
const gen = join(here, "gen_goldens.mjs");
const registerArg = ["--import", join(here, "register.mjs")];
const OUT = "/root/repo/tests/goldens/goldens.json";

const ids = execFileSync("node", [...registerArg, gen, "--list"], {
  encoding: "utf8",
})
  .trim()
  .split("\n");

const goldens = {};
let crashes = 0;
for (const id of ids) {
  const res = spawnSync("node", [...registerArg, gen, "--one", id], {
    encoding: "utf8",
    maxBuffer: 64 * 1024 * 1024,
  });
  const line = res.stdout.trim().split("\n").filter(Boolean).pop();
  if (res.status === 0 && line) {
    const obj = JSON.parse(line);
    const { id: _id, ...rest } = obj;
    goldens[id] = rest;
  } else {
    crashes++;
    const msg = (res.stderr || "").split("\n").slice(0, 12).join("\n");
    const meta = JSON.parse(
      execFileSync("node", [...registerArg, gen, "--meta", id], { encoding: "utf8" })
    );
    goldens[id] = {
      ...meta,
      result: { error: `<reference crash> ${msg.slice(0, 500)}`, crash: true },
    };
    console.error(`CRASH: ${id}`);
  }
}

writeFileSync(OUT, JSON.stringify(goldens, null, 1));
const n = Object.keys(goldens).length;
const errs = Object.values(goldens).filter((g) => g.result.error).length;
console.log(`wrote ${n} goldens (${errs} error-results, ${crashes} crashes) to ${OUT}`);
