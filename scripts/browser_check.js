// Headless render/interaction check for the heatmap HTML templates.
//
// Run: node scripts/browser_check.js <heatmap.html> [i] [j]
//
// Executes the page's embedded renderer script under a minimal DOM/canvas
// stub (no jsdom dependency), then asserts:
//   - the initial draw painted non-background pixels;
//   - a synthetic mousemove over cell/pool-cell (i, j) produces hover text
//     containing "r2:" and "D'";
//   - a wheel event zooms (view scale grows) and a dblclick resets it;
// and prints one JSON line {ok, painted, hover_len, zoomed, reset}.
//
// The CI environment for this repo has no JS engine (see
// tests/test_heatmap_columnar.py + tests/test_heatmap_overview.py for the
// byte-exact Python ports of the same client algorithms); this harness is
// for any machine with node installed.
const fs = require("fs");

const htmlPath = process.argv[2];
const hoverI = parseInt(process.argv[3] || "5", 10);
const hoverJ = parseInt(process.argv[4] || "2", 10);
const html = fs.readFileSync(htmlPath, "utf8");
const m = html.match(/<script>\n([\s\S]*?)<\/script>/);
if (!m) throw new Error("no inline script found");
const script = m[1];

// ---- minimal DOM/canvas stub ------------------------------------------
function makeCtx() {
  const state = {fills: 0, data: null};
  return {
    state,
    fillStyle: "#fff",
    font: "",
    textAlign: "left",
    textBaseline: "alphabetic",
    fillRect() { state.fills++; },
    fillText() {},
    save() {}, restore() {}, translate() {}, rotate() {},
    createImageData(cw, ch) {
      return {width: cw, height: ch,
              data: new Uint8ClampedArray(cw * ch * 4)};
    },
    putImageData(img) { state.data = img.data; },
  };
}

function makeElement(id) {
  const listeners = {};
  const el = {
    id,
    style: {},
    innerHTML: "",
    textContent: "",
    width: 0,
    height: 0,
    listeners,
    addEventListener(name, fn) {
      (listeners[name] = listeners[name] || []).push(fn);
    },
    dispatch(name, ev) {
      ev.preventDefault = ev.preventDefault || (() => {});
      for (const fn of listeners[name] || []) fn(ev);
    },
    getBoundingClientRect() {
      return {left: 0, top: 0, width: el.width, height: el.height};
    },
    getContext() {
      el._ctx = el._ctx || makeCtx();
      return el._ctx;
    },
  };
  return el;
}

const elements = {};
for (const id of ["hm", "tip", "title", "footer", "hint", "wrap"]) {
  elements[id] = makeElement(id);
}
const windowListeners = {};
const rafQueue = [];
global.document = {getElementById: (id) => elements[id]};
global.window = {
  addEventListener(name, fn) {
    (windowListeners[name] = windowListeners[name] || []).push(fn);
  },
};
global.requestAnimationFrame = (fn) => { rafQueue.push(fn); return 0; };
global.atob = (s) => Buffer.from(s, "base64").toString("binary");

// ---- execute the page script with a state probe appended --------------
// (const declarations do not escape eval scope; the probe closure does)
const probe = `
;globalThis.__probe = () => ({
  scale: (typeof view !== "undefined") ? (view.px || view.s) : null,
  cellPx: (typeof view !== "undefined" && view.px) ? view.px
        : (typeof cell !== "undefined" ? cell * (view ? view.s : 1) : 4),
  margin: (typeof margin !== "undefined") ? margin : 0,
});`;
// eslint-disable-next-line no-eval
eval(script + probe);
const flushRaf = () => { while (rafQueue.length) rafQueue.shift()(); };
flushRaf();

const canvas = elements.hm;
const ctx = canvas._ctx;
let painted = 0;
if (ctx.state.data) {
  const d = ctx.state.data;
  for (let k = 0; k < d.length; k += 4) {
    if (d[k] !== 255 || d[k + 1] !== 255 || d[k + 2] !== 255) painted++;
  }
} else {
  painted = ctx.state.fills;  // rect-based template: count paint calls
}

const p0 = globalThis.__probe();
canvas.dispatch("mousemove", {
  clientX: p0.margin + (hoverJ + 0.5) * p0.cellPx,
  clientY: (hoverI + 0.5) * p0.cellPx,
});
const hover = elements.tip.innerHTML;
const hoverOk = hover.indexOf("r2:") >= 0 && hover.indexOf("D'") >= 0;

const before = globalThis.__probe().scale;
canvas.dispatch("wheel", {clientX: 50, clientY: 50, deltaY: -120});
flushRaf();
const after = globalThis.__probe().scale;
canvas.dispatch("dblclick", {});
flushRaf();
const reset = globalThis.__probe().scale;

const out = {
  ok: painted > 0 && hoverOk && after > before && reset === before,
  painted,
  hover_len: hover.length,
  zoomed: after > before,
  reset: reset === before,
};
console.log(JSON.stringify(out));
process.exit(out.ok ? 0 : 1);
