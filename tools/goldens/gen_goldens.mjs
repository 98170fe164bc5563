// Golden-output capture harness.
//
// Executes the reference parser at /root/reference (PUBLIC UNTRUSTED CONTENT,
// executed read-only — its outputs become golden test expectations; none of
// its code is copied into the engine) over:
//   1. all 16 reference fixture files (parseFile path: BOM sniff applies),
//   2. a corpus of edge-case strings (parseString path),
//   3. binary probes written to temp files (invalid UTF-8 / UTF-16 / UTF-32 /
//      NUL truncation — only reachable through the file path),
// across the option matrix {tagNameCasing, ignoreSelfClosingSyntax} where the
// options matter, and serializes each result tree in canonical key order:
//   element:  tagName, attributes?, children?, l, c
//   attr:     name, value, l, c
//   text:     textContent, l, c
//   doctype:  doctypeDeclaration, l, c
//   comment:  comment, l, c
// Run:  node --import ./register.mjs gen_goldens.mjs
import { HTMLParser } from "/root/reference/src/HTMLParser.js";
import { readdirSync, writeFileSync, mkdirSync, rmSync } from "node:fs";
import { join } from "node:path";

const FIXDIR = "/root/reference/test/fixtures";
const OUT = "/root/repo/tests/goldens/goldens.json";
const TMPDIR = "/root/repo/tools/goldens/tmp";

function canonNode(node) {
  if ("tagName" in node) {
    const out = { tagName: node.tagName };
    if (node.attributes !== undefined) {
      out.attributes = node.attributes.map((a) => ({
        name: a.name,
        value: a.value,
        l: a.l,
        c: a.c,
      }));
    }
    if (node.children !== undefined) {
      out.children = node.children.map(canonNode);
    }
    out.l = node.l;
    out.c = node.c;
    return out;
  }
  if ("textContent" in node) {
    return { textContent: node.textContent, l: node.l, c: node.c };
  }
  if ("doctypeDeclaration" in node) {
    return { doctypeDeclaration: node.doctypeDeclaration, l: node.l, c: node.c };
  }
  if ("comment" in node) {
    return { comment: node.comment, l: node.l, c: node.c };
  }
  throw new Error("unknown node shape: " + JSON.stringify(node));
}

async function capture(makeResult) {
  try {
    const nodes = await makeResult().toArray();
    return { nodes: nodes.map(canonNode) };
  } catch (err) {
    return { error: err instanceof Error ? err.message : String(err) };
  }
}

const DEFAULT_OPTS = { tagNameCasing: "lower", ignoreSelfClosingSyntax: false };
const ALL_OPTS = [];
for (const tagNameCasing of ["lower", "upper", "preserve"]) {
  for (const ignoreSelfClosingSyntax of [false, true]) {
    ALL_OPTS.push({ tagNameCasing, ignoreSelfClosingSyntax });
  }
}
const optsTag = (o) =>
  `${o.tagNameCasing}${o.ignoreSelfClosingSyntax ? "_noselfclose" : ""}`;

// --- edge-case strings (behavior contract probes; see FIXTURES.md §3) ---
const STRING_CASES = {
  digit0_tag: "<h0>x</h0>",
  nul_byte: "<div>a\x00b</div>",
  upper_script: "<SCRIPT>var a = '</script>';</SCRIPT>",
  script_tmpl: "<script>let s = `</script>`;</script>x",
  script_quote_ign: "<script>var a = \"</script>\"; ok();</script>tail",
  script_esc_quote: "<script>var a = '\\'</script>'; b();</script>t",
  script_unterm_quote: "<script>var a = '; oops</script>after",
  style_quote: "<style>div::before{content:'</style>'}</style>x",
  backslash_attr: '<div a="say \\"hi\\" \\\\ ok">x</div>',
  backslash_attr2: "<div a='it\\'s \\a \\\\\\' z'>y</div>",
  lower_doctype: "<!doctype html><div>x</div>",
  doctype_basic: "<!DOCTYPE html><html><body>x</body></html>",
  doctype_spaced: "<!DOCTYPE   html  PUBLIC 'x' >rest",
  doctype_newline_before: "ab\n<!DOCTYPE html>x",
  crlf: "<div>a\r\nb</div>",
  lf_vt_ff_cr: "<div>a\x0bb\x0cc\rd\ne</div>",
  stray_close: "<div>a</span>b</div>",
  unwind: "<section><div><em>a</div>b</section>",
  deep_unwind: "<a1><b1><c1><d1>x</a1>tail",
  space_after_lt: "< div>x",
  lt_in_attrname: "<div a<b=c>x</div>",
  slash_space_gt: "<div / >x</div>",
  slash_attr_keep: "<div / a=1>x</div>",
  unquoted_slash_val: "<div a=b/>x</div>",
  unquoted_val_term: "<div a=b>x</div>",
  eq_then_gt: "<div a=>x</div>",
  eq_then_space: '<div a= "x">y</div>',
  textarea_raw: "<textarea><div>not a div</div></textarea>after",
  title_quote: "<title>it's fine</title>after",
  self_close_rawtext: "<script />after",
  self_close_rawtext_style: "<style/>after",
  closing_with_attrs: '<div>x</div class="y">z',
  eof_open_elements: "<em><b>text",
  attr_dupe: "<div a=1 a=2>x</div>",
  comment_empty: "<!---->x",
  comment_ws_trim: "<!--   padded   -->",
  comment_dashes: "<!-- a -- b --->x",
  comment_unterminated: "<!-- never closed",
  comment_fake_close: "<!-->not closed-->x",
  doctype_no_close: "<!DOCTYPE html",
  only_open: "<div",
  only_open_attr: '<a href="',
  only_open_attr_done: '<a href="y"',
  empty_string: "",
  plain_text: "just text, no tags",
  void_with_close: "<br></br>x",
  void_tags: "<meta charset=utf-8><img src=x.png><hr>text",
  pcen_tag: "<café>x</café>",
  astral_tag: "<hey-👋>hi</hey-👋>",
  tag_dot_colon: "<a.b:c-d_e>x</a.b:c-d_e>",
  casing_mixed: "<Div id=A>a<SPAN>b</span></DIV>tail",
  preserve_mismatch: "<Div>a</div>b</Div>c",
  nested_same_tag: "<div><div>a</div>b</div>c",
  bool_attrs: "<input disabled readonly value=x>",
  multiline_attr: '<div data-x="line1\nline2" y>t</div>',
  empty_quoted: '<div a="">x</div>',
  single_quoted: "<div a='v1'>x</div>",
  whitespace_only_text: "<div>   \n\t  </div>",
  text_around: "before<span>mid</span>after",
  self_closing_div: "<div/>after",
  self_closing_nested: "<div><br/><span/>x</div>",
  lt_eof: "a<",
  lt_slash_eof: "a</",
  lt_bang_eof: "a<!-",
  comment_at_eof_partial: "x<!--y--",
  script_with_newlines: "<script>\nlet a=1;\n</script>\n<p>q</p>",
  upper_rawtext_casing_upper: "<STYLE>a{}</STYLE>x",
  attr_value_lt: "<div a=<b>x</div>",
  unicode_text: "<p>héllo wörld — ünïcode ✓ 𝄞</p>",
};

// Option-sensitive strings: run across the whole matrix.
const MATRIX_CASES = new Set([
  "casing_mixed",
  "preserve_mismatch",
  "self_closing_div",
  "self_close_rawtext",
  "upper_script",
  "upper_rawtext_casing_upper",
  "astral_tag",
  "unwind",
  "void_tags",
]);

// --- binary probes (file path only: BOM sniff + raw byte handling) ---
function u16(str, le) {
  const units = [];
  for (let i = 0; i < str.length; i++) units.push(str.charCodeAt(i));
  const buf = Buffer.alloc(2 + units.length * 2);
  if (le) {
    buf[0] = 0xff;
    buf[1] = 0xfe;
    units.forEach((u, i) => buf.writeUInt16LE(u, 2 + i * 2));
  } else {
    buf[0] = 0xfe;
    buf[1] = 0xff;
    units.forEach((u, i) => buf.writeUInt16BE(u, 2 + i * 2));
  }
  return buf;
}
function u32(str, le) {
  const cps = [...str].map((ch) => ch.codePointAt(0));
  const buf = Buffer.alloc(4 + cps.length * 4);
  if (le) {
    buf[0] = 0xff;
    buf[1] = 0xfe;
    cps.forEach((cp, i) => buf.writeUInt32LE(cp, 4 + i * 4));
  } else {
    buf[2] = 0xfe;
    buf[3] = 0xff;
    cps.forEach((cp, i) => buf.writeUInt32BE(cp, 4 + i * 4));
  }
  return buf;
}

const BYTE_CASES = {
  inv_lead_80: Buffer.from("3c6469763e80616263", "hex"), // <div>\x80abc
  inv_lead_f8: Buffer.from([0xf8, 0x20, 0x74]),
  trunc_2byte_tail: Buffer.concat([Buffer.from("<div>a"), Buffer.from([0xc3])]),
  trunc_3byte_tail: Buffer.concat([Buffer.from("<p>x"), Buffer.from([0xe2, 0x82])]),
  bad_continuation: Buffer.concat([
    Buffer.from("<div>a"),
    Buffer.from([0xc3, 0x28]),
    Buffer.from("b</div>"),
  ]),
  overlong_nul: Buffer.concat([
    Buffer.from("<div>"),
    Buffer.from([0xc0, 0x80]),
    Buffer.from("x</div>"),
  ]),
  cesu8_surrogates: Buffer.concat([
    Buffer.from("<div>"),
    Buffer.from([0xed, 0xa0, 0xbd, 0xed, 0xb8, 0x80]),
    Buffer.from("</div>"),
  ]),
  nul_in_file: Buffer.from("<div>a\x00b</div>", "latin1"),
  nul_mid_seq: Buffer.concat([
    Buffer.from("<div>a"),
    Buffer.from([0xc3, 0x00]),
    Buffer.from("b</div>"),
  ]),
  utf16le_basic: u16("<p>hi 👋</p>", true),
  utf16be_basic: u16("<p>hi 👋</p>", false),
  utf16le_tag_emoji: u16("<hey-👋>x</hey-👋>", true),
  utf16le_nul: u16("<p>a\x00b</p>", true),
  utf32le_basic: u32("<p>ok 👋</p>", true),
  utf32be_basic: u32("<p>ok 👋</p>", false),
  bom_only_utf8: Buffer.from([0xef, 0xbb, 0xbf]),
  tiny_3byte: Buffer.from("<p>"),
  utf8_bom_then_doc: Buffer.concat([
    Buffer.from([0xef, 0xbb, 0xbf]),
    Buffer.from("<div>x</div>"),
  ]),
  ff_fe_not32: Buffer.concat([
    Buffer.from([0xff, 0xfe]),
    Buffer.from("<p>\x00", "latin1"),
  ]),
  // fuzz-discovered divergence inputs (both fixed; pinned forever):
  // oversized code point from 4-byte raw math -> raw RangeError abort
  oversized_cp: Buffer.from([0xf5, 0x01, 0x01, 0x01]),
  // oversized cp buffered but never built + invalid lead byte after ->
  // the lead-byte error wins (text is not flushed on ERROR terminators)
  oversized_then_badlead: Buffer.from([0xf5, 0x01, 0x01, 0x01, 0x80]),
  // oversized cp inside skipped closing-tag junk: parses fine
  oversized_in_skip: Buffer.concat([
    Buffer.from("<div>a</div"),
    Buffer.from([0x20, 0xf5, 0x01, 0x01, 0x01]),
    Buffer.from(">b"),
  ]),
  // decode error inside an element's attribute loop: the reference's abort
  // message interpolates the OPENING_TAGNAME token (parseTemplate.js:157-166
  // uses the outer `token` variable) — bug replicated for byte-exactness
  badlead_in_tag: Buffer.concat([Buffer.from("<A\x01"), Buffer.from([0x80])]),
  badlead_in_attr_value: Buffer.concat([
    Buffer.from('<div class="x'),
    Buffer.from([0xfe]),
  ]),
  // partial trailing code units: the reference's DataView reads past the
  // payload into deterministic buffer bytes (zeros < 256 B; previous-chunk
  // bytes above). Pins the buffer-emulation in chardecode.
  utf16be_odd_tail: Buffer.from([0xfe, 0xff, 0x00, 0x01, 0x00, 0x01, 0x01]),
  utf16le_odd_tail: Buffer.from([0xff, 0xfe, 0x61, 0x00, 0x62]),
  utf32le_tail2: Buffer.concat([
    Buffer.from([0xff, 0xfe, 0x00, 0x00]),
    Buffer.from([0x61, 0x00, 0x00, 0x00, 0x62, 0x00]),
  ]),
  utf16le_big_odd_tail: (() => {
    // > 256 bytes so the dangling read hits the PREVIOUS chunk's byte
    const units = [];
    for (let i = 0; i < 140; i++) units.push(0x61 + (i % 20)); // 280 payload bytes
    const buf = Buffer.alloc(2 + units.length * 2 + 1);
    buf[0] = 0xff;
    buf[1] = 0xfe;
    units.forEach((u, i) => buf.writeUInt16LE(u, 2 + i * 2));
    buf[buf.length - 1] = 0x7a; // dangling 'z' low byte
    return buf;
  })(),
};

function buildCaseList() {
  const cases = [];
  const fixtures = readdirSync(FIXDIR).sort();
  for (const fx of fixtures) {
    const path = join(FIXDIR, fx);
    const optsList = [DEFAULT_OPTS];
    if (fx === "inlineSubComponents.tmph.html" || fx === "componentWithScripts.tmph.html") {
      optsList.push(
        { tagNameCasing: "preserve", ignoreSelfClosingSyntax: false },
        { tagNameCasing: "upper", ignoreSelfClosingSyntax: false },
        { tagNameCasing: "lower", ignoreSelfClosingSyntax: true }
      );
    }
    for (const opts of optsList) {
      cases.push({
        id: `file:${fx}:${optsTag(opts)}`,
        meta: { kind: "file", fixture: fx, options: opts },
        run: () => new HTMLParser(opts).parseFile(path),
      });
    }
  }
  for (const [name, html] of Object.entries(STRING_CASES)) {
    const optsList = MATRIX_CASES.has(name) ? ALL_OPTS : [DEFAULT_OPTS];
    for (const opts of optsList) {
      cases.push({
        id: `string:${name}:${optsTag(opts)}`,
        meta: { kind: "string", html, options: opts },
        run: () => new HTMLParser(opts).parseString(html),
      });
    }
  }
  for (const [name, buf] of Object.entries(BYTE_CASES)) {
    cases.push({
      id: `bytes:${name}:${optsTag(DEFAULT_OPTS)}`,
      meta: { kind: "bytes", bytes_b64: buf.toString("base64"), options: DEFAULT_OPTS },
      run: () => {
        mkdirSync(TMPDIR, { recursive: true });
        const p = join(TMPDIR, `${name}.bin`);
        writeFileSync(p, buf);
        return new HTMLParser(DEFAULT_OPTS).parseFile(p);
      },
    });
  }
  return cases;
}

// CLI: --list prints ids; --one <id> runs a single case (isolated process so
// a reference-internal crash only loses that case) and prints one JSON line.
const argv = process.argv.slice(2);
const cases = buildCaseList();

if (argv[0] === "--list") {
  for (const c of cases) console.log(c.id);
} else if (argv[0] === "--meta") {
  const c = cases.find((x) => x.id === argv[1]);
  if (!c) process.exit(2);
  console.log(JSON.stringify(c.meta));
} else if (argv[0] === "--one") {
  const c = cases.find((x) => x.id === argv[1]);
  if (!c) {
    console.error(`no such case: ${argv[1]}`);
    process.exit(2);
  }
  const result = await capture(c.run);
  rmSync(TMPDIR, { recursive: true, force: true });
  console.log(JSON.stringify({ id: c.id, ...c.meta, result }));
} else {
  console.error("usage: gen_goldens.mjs --list | --one <id>");
  process.exit(2);
}
