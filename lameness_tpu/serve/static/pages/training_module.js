// TrainingModule.tsx — the "Lameness Duolingo" learn surface: rater
// progress/level, worked examples with answer reveal, leaderboard.
import {api, h, main, pct, esc, short, table} from "/static/app.js";

export default async function TrainingModule() {
  const [prog, board, ex] = await Promise.all([
    api("/api/training/learn/progress"),
    api("/api/training/learn/leaderboard"),
    api("/api/training/learn/examples")]);
  const toNext = Math.max(0, prog.level * 10 - prog.comparisons);
  main.append(h(`<div class="panel"><h2>Learn — your progress</h2>
    <div class="row">
      <span class="stat">Lv ${prog.level}</span>
      <div style="flex:1;max-width:320px"><div class="bar">
        <i style="width:${100 * Math.min(1, (prog.comparisons % 10) / 10)}%"></i>
      </div><div class="dim">${toNext} more comparisons to level
        ${Math.min(10, prog.level + 1)}</div></div>
      <span class="badge ${prog.tier === 'gold' ? 'warn' : ''}">${esc(prog.tier)} tier</span>
      <span class="dim">gold-task accuracy</span>
      <b>${prog.gold_accuracy == null ? "—" : pct(prog.gold_accuracy)}</b>
      <button class="action" onclick="go('pairwise')">Rate pairs →</button>
    </div></div>
  <div class="panel"><h2>Worked examples
      <span class="dim">(watch, judge, then reveal)</span></h2>
    <div class="grid3" id="ex"></div></div>
  <div class="panel"><h2>Leaderboard</h2><div id="board"></div></div>`));

  const grid = document.getElementById("ex");
  if (!ex.examples.length) {
    grid.innerHTML = `<span class="dim">no examples yet — analyze and label
      videos, or create gold tasks</span>`;
  }
  ex.examples.slice(0, 9).forEach((e, i) => {
    const card = h(`<div class="panel">
      <video controls muted src="/api/videos/${e.video_id}/stream"
        style="max-height:150px"></video>
      <div class="row"><button class="mini" data-i="${i}">reveal answer</button>
        <span id="ans${i}"></span></div>
      <div class="dim">${esc(e.source)}</div></div>`);
    grid.append(card);
    card.querySelector("button").onclick = () => {
      document.getElementById("ans" + i).innerHTML =
        `<span class="badge ${e.label === 'lame' ? 'bad' : 'ok'}">${esc(e.label)}</span>
         ${e.probability != null ? `<span class="dim">p=${pct(e.probability)}</span>` : ""}`;
    };
  });

  document.getElementById("board").innerHTML = table(board, [
    ["#", (r, i) => board.indexOf(r) + 1],
    ["rater", r => esc(r.username)],
    ["comparisons", r => r.n],
  ]);
}
