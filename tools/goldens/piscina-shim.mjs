// In-process stand-in for the `piscina` worker pool so the reference parser
// (/root/reference, PUBLIC UNTRUSTED CONTENT — executed only to capture golden
// outputs) can run without installing dependencies in this sandbox.
// The reference dispatches `lex()` to a worker thread; running it in-process
// is behavior-identical for golden capture (same token stream, no thread
// boundary semantics leak into outputs).
export default class Piscina {
  constructor({ filename, name }) {
    this.filename = filename;
    this.name = name;
  }
  async run(args, _opts) {
    const mod = await import(this.filename);
    return mod[this.name](args);
  }
}
