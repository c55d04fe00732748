// TripletComparison.tsx: similarity/dissimilarity triplets against a
// reference clip (routers/training.py:459-650 enumeration).
import {api, h, main, esc, toast} from "/static/app.js";

export default async function TripletComparison() {
  let t;
  try { t = await api("/api/training/triplet/next"); }
  catch (e) {
    return main.append(h(`<div class="panel">${esc(e.message)}
      — need at least three analyzed videos.</div>`));
  }
  const stats = await api("/api/training/triplet/stats");
  const q = t.task_type === "similarity" ?
    "Which cow walks MOST like the reference?" :
    "Which cow walks LEAST like the reference?";
  main.append(h(`<div class="panel"><h2>${q}
      <span class="dim">(${t.remaining} remaining ·
      ${stats.total_triplets} answered)</span></h2>
    <div class="panel" style="text-align:center"><div class="dim">reference</div>
      <video controls autoplay muted loop
        src="/api/videos/${t.reference}/stream" style="max-height:220px"></video></div>
    <div class="vs">
      <div class="panel"><div class="dim">A — press [a]</div>
        <video controls muted loop src="/api/videos/${t.option_a}/stream"></video>
        <button class="action" id="a">This one</button></div>
      <div class="panel"><div class="dim">B — press [b]</div>
        <video controls muted loop src="/api/videos/${t.option_b}/stream"></video>
        <button class="action" id="b">This one</button></div>
    </div>
    <div class="row" style="justify-content:center">
      <button class="mini" id="skip">skip</button></div></div>`));
  async function vote(choice) {
    try {
      await api("/api/training/triplet/submit", {json: {
        reference: t.reference, option_a: t.option_a, option_b: t.option_b,
        choice, task_type: t.task_type}});
      window.go("triplet");
    } catch (e) { toast(e.message, "bad"); }
  }
  document.getElementById("a").onclick = () => vote("a");
  document.getElementById("b").onclick = () => vote("b");
  document.getElementById("skip").onclick = () => window.go("triplet");
  document.onkeydown = (e) => {
    if (e.key === "a") vote("a");
    else if (e.key === "b") vote("b");
  };
}
