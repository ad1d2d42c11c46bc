// Results browser (ref llava/eval/webpage/script.js): category/question
// dropdowns over data.json; renders each model's answer + judge scores.
let DATA = null;

async function load() {
  DATA = await (await fetch('data.json')).json();
  const cats = [...new Set(DATA.records.map(r => r.category))];
  const catSel = document.getElementById('category');
  catSel.innerHTML = cats.map(c => `<option>${c}</option>`).join('');
  catSel.onchange = fillQuestions;
  fillQuestions();
}

function fillQuestions() {
  const cat = document.getElementById('category').value;
  const qSel = document.getElementById('question');
  const recs = DATA.records.filter(r => r.category === cat);
  qSel.innerHTML = recs.map(r =>
    `<option value="${r.question_id}">Q${r.question_id}: ${r.question.slice(0, 60)}</option>`
  ).join('');
  qSel.onchange = render;
  render();
}

function render() {
  const qid = parseInt(document.getElementById('question').value, 10);
  const rec = DATA.records.find(r => r.question_id === qid);
  if (!rec) return;
  let html = `<section class="question"><h2>${rec.question}</h2></section>`;
  for (const m of DATA.models) {
    const a = rec.answers[m] || '(no answer)';
    html += `<section class="answer"><h3>${m}</h3><p>${a}</p></section>`;
  }
  for (const [pair, scores] of Object.entries(rec.scores)) {
    html += `<section class="score"><h3>judge: ${pair}</h3>` +
            `<p>${scores.join(' vs ')}</p></section>`;
  }
  document.getElementById('content').innerHTML = html;
}

load();
