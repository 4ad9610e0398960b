"""Dev-time generator for multilingual stemmer validation vectors.

Queries a LOCAL scratch PostgreSQL (ground truth: PG's Snowball
dictionaries, the exact stemmers the reference engine inherits through
to_tsvector) for each word list below and writes
tests/data/stem_vectors_{lang}.json. The committed JSON is what tests
run against — no PostgreSQL needed at test time.

Usage: python tools/gen_stem_vectors.py [host] [port]
(defaults /tmp/pgts_pg 54333 — see session notes; any PG >= 13 works)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "tests", "data")

FRENCH = """
continuelles continuel majestueusement majestueuse majestueux
nationale nationales national nationaux internationale
chevaux cheval journaux journal travaux travail beaux beau
animaux canaux généraux originaux loyaux
création créations créateur créatrice créateurs créatrices
communication organisation organisations civilisation
logique logiques logie logies biologie biologies technologie
conclusion conclusions solution solutions évolution évolutions
confusion illusions précision
différence différences évidence influence influences
rapidement doucement heureusement sérieusement naturellement
finalement seulement également lentement vraiment
abondamment constamment évidemment prudemment récemment
possibilité possibilités activité activités qualité qualités
capacité université utilité réalité facilité
actif active actifs actives créatif créative significatif
relative relatifs positive négatives
chanteuse chanteuses vendeuse danseuses heureuse heureuses
établissement établissements investissement investissements
finir finis finit finissons finissez finissent finissais
finissait finissaient finissant finissante finissantes finie finies
choisir choisis choisissons grandissant
donner donne donnes donnons donnez donnent donnais donnait
donnaient donnant donnante donné donnée données donnés
donnera donnerai donneras donnerons donneront donnerez
donnerait donneraient donnèrent donnions donniez
mangeait mangea mangeant mangeâmes mangeât
parler parlons parlions parliez parlâtes parlas parlasse
parlassent parlassiez parlassions
aimai aimais aimait aimâmes aimâtes aimèrent
payer payons payait essayer essayait nettoyer envoyé
travailler travaillons travailleur travailleurs
premier première premiers premières dernier dernière
particulier particulière entier entièrement
famille familles fille filles ville villes
belle belles nouvelle nouvelles personnelle personnelles
ancienne anciennes européenne moyenne
bonne bonnes personne personnes
cadette lunettes toilettes
appelle appellent rappelle
conseille conseiller merveilleux
yeux cheveux jeux lieux mieux dieux
sérieux curieux dangereux nombreux nombreuses
continuer continué continuité
ambiguë aiguë exiguë
avançons commençons français
crément décès procès très après succès accès
père mère frère première lumière manière matière
département automatiquement systématiquement
abaissement abaissements
"""

GERMAN = """
aufeinanderfolgenden aufeinanderfolgende aufeinander
kindern kinder kindes kind kinde
häusern häuser hauses haus hause
büchern bücher buches buch
männer männern mannes mann
frauen frau frauens
straße straßen strasse strassen
größe größen grösse
weiße weißen weiss
fußball füße
ergebnisse ergebnissen ergebnis erlebnisse erlebnis
verhältnisse verhältnissen verhältnis
bedürfnisse hindernisse zeugnisse
arbeiten arbeitet arbeitete arbeiteten gearbeitet
machen macht machte machten gemacht
spielen spielt spielte spielten gespielt spielend
laufen läuft liefen gelaufen laufend
sagen sagte gesagt sagend
kommen kommt kamen gekommen
gehen geht gingen gegangen
schnellsten schnellste schnellster schnellstes schnellst
größten größte größter
kleinsten kleinste kleinster
besten beste bester bestes
schönsten schönste schönster
bildung bildungen zeitung zeitungen regierung regierungen
entwicklung entwicklungen forschung forschungen
bedeutung bedeutungen erfahrung erfahrungen
verbindungen bewegungen änderungen
lebend lebende lebenden lebendig lebendige
ständig ständige ständigen vollständig vollständigen
richtig richtige richtigen wichtig wichtige wichtigen
künstlich künstliche natürlich natürliche natürlichen
freundlich freundliche persönlich persönliche
möglich mögliche möglichen möglichkeit möglichkeiten
wirklich wirklichkeit wirklichkeiten
schönheit schönheiten gesundheit krankheit krankheiten
freiheit freiheiten kindheit
gelegenheit gelegenheiten vergangenheit
fähigkeit fähigkeiten geschwindigkeit geschwindigkeiten
ewigkeit tätigkeit tätigkeiten
sauberkeit heiterkeit
musik musiker physik technik techniken politik
praktisch praktische elektrisch elektrische
historisch historische typisch typische
systematisch automatisch
bauen baut baute gebaut bauend
trauen vertrauen trauern
freuen freut gefreut
neuen neue neuer neues neuem
treuen treue treuer
bläuen
studieren studiert studierte studierten
regnerisch malerisch
wanderer wanderern wandern wanderung wanderungen
lehrerinnen lehrerin lehrer lehrern
universitäten universität
qualitäten qualität aktivitäten aktivität
"""

SPANISH = """
torcedores torcedor atravesándolos atravesando atravesar
niños niñas niño niña señores señora señoras
esperanza esperanzas confianza mudanzas
práctico práctica prácticos prácticas
científico científica económico económicas
organismo organismos periodismo turismo
notable notables amable amables responsable responsables
posible posibles increíble increíbles terrible
artista artistas turista turistas realista
hermoso hermosa hermosos hermosas famoso famosas
peligroso maravillosa
pensamiento pensamientos movimiento movimientos
sentimiento sentimientos crecimiento conocimiento
trabajadora trabajador trabajadores trabajadoras
investigador investigadores computadora computadoras
creación creaciones información informaciones
comunicación comunicaciones organización organizaciones
civilización educación administración
identificación clasificación
biología biologías tecnología tecnologías psicología
solución soluciones evolución evoluciones revolución
constitución distribución
presencia presencias influencia influencias
paciencia experiencia experiencias
rápidamente fácilmente felizmente naturalmente
completamente directamente exactamente
efectivamente relativamente activamente
generosamente caprichosamente
auténticamente científicamente
adecuadamente delicadamente
finalmente solamente totalmente realmente
elegantemente amablemente increíblemente
posibilidad posibilidades capacidad capacidades
actividad actividades calidad calidades
universidad universidades realidad facilidad
electricidad publicidad
productivo productiva productivos productivas
creativo creativa negativos positivas
informativo informativa
cantando cantado cantar canto cantos canta cantan
cantaba cantaban cantó cantaron cantará cantarán
cantaría cantarían cantase cantasen cantara cantaran
cantáramos cantásemos cantemos cantad
comiendo comido comer come comen comía comían
comió comieron comerá comerán comería comerían
comiese comiesen comiera comieran comiéramos
viviendo vivido vivir vive viven vivía vivían
vivió vivieron vivirá vivirán viviría vivirían
hablando hablado hablar hablo hablas habláis hablamos
hablabais hablasteis hablaseis hablarais hablaríais
temiendo temido temer temeré temerás temeremos temeréis
partiendo partido partir partiré partirás partiremos partiréis
siguiendo seguir sigue siguen siguió siguieron
jugando jugar juega juegan jugó jugaron
llegando llegar llega llegan llegó llegaron llegue lleguen
pagando pagar paga pagan pagó pagaron pague paguen
buscando buscar busca buscan buscó buscaron busque busquen
cayendo cayó cayeron leyendo leyó leyeron
oyendo oyó oyeron huyendo huyó huyeron
construyendo construyó construyeron
dámelo dámela dárselo dárselos decírselo
mirándose mirándola mirándolas lavándose
escribiéndole escribiéndoles
comprárselo vendérsela
quedándonos sentándose
atreverse atreviéndose
guía guías agua aguas lengua lenguas antiguo antigua antiguos
"""


_FUZZ_ALPH = {
    "french": "aeiouyâàëéêèïîôûùbcdfgjlmnpqrstvxzç",
    "german": "aeiouyäöübcdfghklmnprstwzß",
    "spanish": "aeiouáéíóúübcdfghjlmnñpqrstvyz",
}
_FUZZ_SUFS = {
    "french": ["ement", "ements", "ité", "atrice", "logie", "usion",
               "ence", "if", "ive", "eaux", "aux", "euse", "issement",
               "amment", "emment", "ment", "ance", "iste", "eux", "ions",
               "er", "é", "ées", "èrent", "assiez", "issaient", "ît",
               "âmes", "ier", "ière", "guë", "enne", "ette", "eille",
               "s", "x", "aient", "yeux", "qu", "tions", "sions"],
    "german": ["ern", "em", "er", "e", "en", "es", "s", "est", "st",
               "end", "ung", "ig", "ik", "isch", "lich", "heit", "keit",
               "nisse", "erinnen", "ss", "chen"],
    "spanish": ["selos", "melo", "ándolos", "iéndose", "yendo", "anza",
                "ico", "ismo", "able", "ista", "oso", "amiento", "adora",
                "ación", "logía", "ución", "encia", "amente", "mente",
                "idad", "iva", "ya", "yeron", "éis", "emos", "aríamos",
                "iésemos", "ís", "guen", "gue", "ó", "á", "os", "e", "é"],
}


def _fuzz_words(lang: str, n: int = 500) -> set[str]:
    """Deterministic pseudo-word fuzz aimed at rare algorithm branches."""
    import random
    rng = random.Random(f"stem-fuzz-{lang}")
    alph, sufs = _FUZZ_ALPH[lang], _FUZZ_SUFS[lang]
    out: set[str] = set()
    while len(out) < n:
        b = "".join(rng.choice(alph) for _ in range(rng.randint(1, 9)))
        w = b + rng.choice(sufs) if rng.random() < 0.8 else b
        if rng.random() < 0.35:
            w += rng.choice(sufs)
        out.add(w)
    return out


def main() -> int:
    host = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pgts_pg"
    port = sys.argv[2] if len(sys.argv) > 2 else "54333"
    os.makedirs(OUT, exist_ok=True)
    for lang, dic, words in (("french", "french_stem", FRENCH),
                             ("german", "german_stem", GERMAN),
                             ("spanish", "spanish_stem", SPANISH)):
        wl = sorted(set(words.split()) | _fuzz_words(lang))
        values = ", ".join(f"('{w}')" for w in wl)
        sql = (f"SELECT w, (ts_lexize('{dic}', w))[1] FROM (VALUES {values})"
               " AS t(w) ORDER BY w")
        out = subprocess.run(
            ["psql", "-h", host, "-p", port, "-U", "pgoracle", "-d",
             "postgres", "-At", "-F", "\t", "-c", sql],
            capture_output=True, text=True, check=True).stdout
        vec = {}
        for line in out.strip().splitlines():
            w, s = line.split("\t")
            vec[w] = s
        path = os.path.join(OUT, f"stem_vectors_{lang}.json")
        with open(path, "w", encoding="utf-8") as f:
            json.dump(vec, f, ensure_ascii=False, indent=0, sort_keys=True)
        print(f"{lang}: {len(vec)} vectors -> {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
